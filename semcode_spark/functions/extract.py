"""HTML → text extraction (Arrow-vectorized, byte-identical per url).

The reference's parse stage decodes raw bytes with errors="ignore" and
segments the result (reference: chunking/tree_sitter_chunker.py:158-166);
our analog decodes ``html:binary`` the same way and extracts body text.
The invariant demanded by input_hint — *byte-identical extracted text per
url* — is enforced in tests/test_extract.py against the golden ``text``
column of the synthetic corpus.

Bytes stay BinaryType until inside the UDF (SURVEY §7.3 hard part a):
pandas receives raw bytes objects, so Python's errors="ignore" semantics
apply exactly; letting Spark cast binary→string first would replace
invalid bytes instead of dropping them.

This is a scalar pandas_udf (Arrow batches), never row-at-a-time Python,
and the fallback branch (no <body> found → whole-document tag strip)
mirrors the reference's plain-text fallback chunker
(tree_sitter_chunker.py:204-239).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_BODY_RE = re.compile(r"<body[^>]*>(.*)</body>", re.DOTALL | re.IGNORECASE)
_DROP_RE = re.compile(
    r"<(script|style|nav|header|footer|aside)[^>]*>.*?</\1>",
    re.DOTALL | re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html: bytes | None) -> str:
    """Single-value extraction rule (shared with the pure-Python oracle):
    decode errors=ignore → scope to <body> → drop boilerplate containers
    (script/style/nav/header/footer/aside, contents included) → strip
    remaining tags → collapse whitespace."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="ignore")
    m = _BODY_RE.search(s)
    scope = m.group(1) if m else s  # fallback: strip tags over the whole doc
    scope = _DROP_RE.sub(" ", scope)
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", scope)).strip()


def extract_text(html: Column) -> Column:
    """Apply the extraction rule as a scalar pandas_udf (created lazily —
    pandas_udf needs an active SparkSession to resolve the return type)."""

    @pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(extract_text_py)

    return _extract(html)


# ------------------------------------------------------ doc metadata (T6) ---

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_ANCHOR_RE = re.compile(r"<a\s", re.IGNORECASE)
_HEADING_RE = re.compile(r"<h[1-6][\s>]", re.IGNORECASE)


def extract_metadata_py(html: bytes | None) -> tuple[str, int, int, bool]:
    """Structural doc metadata: (title, n_links, n_headings, has_article)
    — the lexical analog of the reference's symbol-extraction heuristic
    (chunking/tree_sitter_chunker.py:106-125: the chunk's primary named
    AST node; for a web page the primary symbol is its <title>)."""
    if html is None:
        return ("", 0, 0, False)
    s = html.decode("utf-8", errors="ignore")
    m = _TITLE_RE.search(s)
    title = _WS_RE.sub(" ", m.group(1)).strip() if m else ""
    return (
        title,
        len(_ANCHOR_RE.findall(s)),
        len(_HEADING_RE.findall(s)),
        "<article" in s.lower(),
    )


def extract_metadata(html: Column) -> Column:
    """Doc-metadata struct column (title, n_links, n_headings,
    has_article) via the same Arrow-batched kernel discipline as
    extract_text."""

    @pandas_udf("title string, n_links int, n_headings int, has_article boolean")
    def _meta(s: pd.Series) -> pd.DataFrame:
        rows = s.map(extract_metadata_py)
        return pd.DataFrame({
            "title": rows.map(lambda r: r[0]),
            "n_links": rows.map(lambda r: r[1]),
            "n_headings": rows.map(lambda r: r[2]),
            "has_article": rows.map(lambda r: r[3]),
        })

    return _meta(html)
