"""Pluggable analyzers — the lexical analog of the reference's pluggable
embedding providers (embeddings/providers.py:34-104: impl selected by
config) and its optional refinement pass (code2prompt_adapter.py:18-37).

An analyzer is a pure Column → Column(array<string>) function chosen by
name, so the index build and the query side can share one configured
analyzer (they MUST match, or query terms miss the postings — same
invariant as embedding the query with the same model that embedded the
corpus, rag/pipeline.py:171-175).

All analyzers are JVM higher-order functions: no Python in the build's
hot path regardless of configuration.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from semcode_spark.functions.tokenize import tokens_col

# a compact English stopword list (fixed — part of the index contract)
STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with this but they have had what when where who which"
).split()

_SUFFIXES = ["ing", "edly", "ed", "es", "s"]  # longest-first porter-lite


def _strip_suffix(t: Column) -> Column:
    out = t
    # apply the FIRST matching suffix rule only (chained whens), keep
    # stems ≥ 3 chars
    expr = None
    for suf in _SUFFIXES:
        cond = t.endswith(suf) & (F.length(t) - len(suf) >= 3)
        stem = t.substr(F.lit(1), F.length(t) - len(suf))
        expr = F.when(cond, stem) if expr is None else expr.when(cond, stem)
    return expr.otherwise(t)


def analyzer(name: str = "standard"):
    """Return tokens(text_col) for the named analyzer:

    - ``standard``: lowercase alnum runs (the oracle-shared default)
    - ``stop``: standard minus STOPWORDS
    - ``stem``: standard + suffix stripping (porter-lite)
    - ``stop_stem``: both
    """
    if name == "standard":
        return tokens_col

    def toks(text_col) -> Column:
        t = tokens_col(text_col)
        if name in ("stop", "stop_stem"):
            t = F.filter(t, lambda x: ~x.isin(STOPWORDS))
        if name in ("stem", "stop_stem"):
            t = F.transform(t, _strip_suffix)
        return t

    if name not in ("stop", "stem", "stop_stem"):
        raise ValueError(f"unknown analyzer {name!r}")
    return toks


def analyze_query(name: str, text: str) -> list[str]:
    """Driver-side twin for query tokenization under the same analyzer."""
    from semcode_spark.functions.tokenize import tokenize_query

    terms = tokenize_query(text)
    if name in ("stop", "stop_stem"):
        terms = [t for t in terms if t not in STOPWORDS]
    if name in ("stem", "stop_stem"):
        def stem(t: str) -> str:
            for suf in _SUFFIXES:
                if t.endswith(suf) and len(t) - len(suf) >= 3:
                    return t[: -len(suf)]
            return t
        terms = [stem(t) for t in terms]
    return terms
