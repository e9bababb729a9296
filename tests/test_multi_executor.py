"""True multi-executor execution (local-cluster: separate executor JVMs
+ python workers, code shipped via the --py-files zip) — the closest a
single box gets to the north rule's multi-executor cluster: it exercises
executor-side imports of semcode_spark, cross-JVM shuffles, and the
Arrow kernels outside the driver process. Build + WAND answers must be
rank-identical to the single-JVM result.
"""

import os
import tempfile

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def cluster_spark():
    from pyspark.sql import SparkSession

    from semcode_spark.packaging import make_pyfiles_zip

    zip_path = make_pyfiles_zip(
        os.path.join(tempfile.gettempdir(), "semcode_spark_lc.zip"))
    s = (
        SparkSession.builder.master("local-cluster[2,2,1024]")
        .appName("semcode-multi-executor")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.submit.pyFiles", zip_path)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.addPyFile(zip_path)
    yield s
    s.stop()


def test_build_and_query_across_executors(cluster_spark):
    from semcode_spark.config import BM25Config, EngineConfig, IndexConfig
    from semcode_spark.operators.index_build import build_index, read_index
    from semcode_spark.operators.query import phrase_match, wand_topk

    spark = cluster_spark
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    cfg = EngineConfig(bm25=BM25Config(), index=IndexConfig(
        term_buckets=8, block_size=16, store_positions=True))
    d = tempfile.mkdtemp(prefix="lc_idx_")
    out = build_index(spark, docs, d, cfg=cfg, groups=2)
    assert out["n_docs"] == docs.count()

    idx = read_index(spark, d)
    got = [(r["doc_id"], round(r["score"], 4))
           for r in wand_topk(spark, idx, "spark query data", k=5,
                              cfg=cfg, prune=True).collect()]
    # golden from the single-JVM path (tests/test_wand.py corpus) — the
    # multi-executor plan must be rank-identical
    assert got[0] == (340, 1.22) and got[1] == (356, 1.2), got
    assert len(got) == 5

    hits = {r["doc_id"] for r in phrase_match(spark, idx, "table scan").collect()}
    assert hits  # phrase path (positional decode) also runs on executors
