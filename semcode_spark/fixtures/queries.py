"""The reference query set (FIXTURES.md §2): 24 deterministic queries
covering the retrieval surface — single hot term, single rare term,
2-4 term conjunctions, out-of-vocabulary terms, hot-term combinations —
with k defaulting to 10 (reference storage/milvus_store.py:135) and a
few rows at k=5 / k=15 (settings.py:67, semcode_settings.toml.sample:107).

Two sets: one phrased over the driver's ``documents`` table vocabulary,
one over the synthetic webtext vocabulary (w0.. Zipf terms).
"""

from __future__ import annotations

# (query_id, query_text, k) — documents-table vocabulary
REFERENCE_QUERIES: list[tuple[int, str, int]] = [
    (0, "the", 10),                       # hot single term
    (1, "join", 10),                      # hottest term
    (2, "dup", 10),                       # rare discriminative term
    (3, "window", 10),
    (4, "spark query", 10),               # 2-term
    (5, "table scan", 10),                # 2-term, phrase-like
    (6, "merge sort batch", 10),          # 3-term
    (7, "spark query data", 10),
    (8, "slow batch value filter", 10),   # 4-term
    (9, "customer line order part", 10),
    (10, "zzznotaword", 10),              # fully OOV
    (11, "spark zzznotaword", 10),        # mixed OOV
    (12, "the a", 10),                    # two hot terms
    (13, "dup merge", 10),                # rare + mid
    (14, "hash row column vector", 10),
    (15, "stream group key agg", 10),
    (16, "fast small big slow", 10),
    (17, "sort", 5),                      # k=5 (pipeline default)
    (18, "filter data", 5),
    (19, "query", 15),                    # k=15 (sample config)
    (20, "value key", 15),
    (21, "the join hash row", 10),        # all hot
    (22, "dup window stream", 10),
    (23, "a", 10),
]

# webtext vocabulary variant (w0 hot … tail rare)
WEBTEXT_QUERIES: list[tuple[int, str, int]] = [
    (0, "w0", 10), (1, "w1", 10), (2, "w19000", 10), (3, "w0 w1", 10),
    (4, "w2 w3 w4", 10), (5, "w0 w12345", 10), (6, "zzz", 10),
    (7, "w1 w2", 5), (8, "w5", 15), (9, "w0 w1 w2 w3", 10),
]
