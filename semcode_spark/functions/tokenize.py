"""Tokenization — the engine's analog of the reference's chunker.

The reference segments documents with a stateful line-packer
(reference: chunking/tree_sitter_chunker.py:241-262); our document unit is
the web page and the segmentation unit is the *term*. Tokenization stays
entirely JVM-side (whole-stage codegen: lower → regex split → filter) —
no Python in the hot path.

The split pattern is shared verbatim with the DuckDB oracle SQL
(``regexp_split_to_array(lower(text), '[^a-z0-9]+')``) so Spark results
and oracle results tokenize identically — the same determinism contract
as the reference's DummyEmbedding stub
(tests/integration/test_indexer_service.py:8-9).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from semcode_spark.config import DEFAULT

TOKEN_SPLIT = DEFAULT.index.token_pattern  # "[^a-z0-9]+"
_SPLIT_RE = re.compile(TOKEN_SPLIT)


def tokens_col(text: Column | str) -> Column:
    """array<string> of tokens: lowercase, alnum runs, empties dropped.

    Pure built-ins → stays inside WholeStageCodegen.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != "")


def doc_len_col(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def tokenize_query(text: str) -> list[str]:
    """Driver-side query tokenization (tiny input — the one place plain
    Python is fine, cf. reference rag/pipeline.py:171-175 embedding the
    query as a single-row op)."""
    return [t for t in _SPLIT_RE.split(text.lower()) if t]
