"""Pure-Python single-process BM25 oracle.

The golden-truth generator for rank-identity tests (SURVEY §5): same
tokenizer regex, exhaustive textbook scoring, explicit (score desc,
doc_id asc) tie-break. Mirrors the reference's deterministic-stub test
pattern (tests/integration/test_indexer_service.py:7-13) upgraded to
full golden top-k.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from semcode_spark.config import DEFAULT, EngineConfig

_SPLIT_RE = re.compile(DEFAULT.index.token_pattern)


def tokenize(text: str) -> list[str]:
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


class BM25Oracle:
    def __init__(self, docs: dict[int, str], cfg: EngineConfig = DEFAULT):
        from semcode_spark.functions.analyzers import analyze_query

        self.cfg = cfg
        self._tok = lambda t: analyze_query(cfg.index.analyzer, t)
        self.tf: dict[int, Counter] = {d: Counter(self._tok(t)) for d, t in docs.items()}
        self.dl = {d: sum(c.values()) for d, c in self.tf.items()}
        self.n = len(docs)
        self.avgdl = sum(self.dl.values()) / self.n if self.n else 0.0
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, doc_id: int, terms: list[str]) -> float:
        k1, b = self.cfg.bm25.k1, self.cfg.bm25.b
        c, dl = self.tf[doc_id], self.dl[doc_id]
        s = 0.0
        for t in terms:
            tf = c.get(t, 0)
            if tf:
                s += self.idf(t) * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl / self.avgdl)
                )
        return s

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = sorted(set(self._tok(query)))
        scored = [
            (d, self.score(d, terms))
            for d in self.tf
            if any(t in self.tf[d] for t in terms)
        ]
        nd = self.cfg.bm25.rank_decimals
        scored.sort(key=lambda x: (-round(x[1], nd), x[0]))
        return scored[:k]
