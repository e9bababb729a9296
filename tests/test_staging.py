import pytest
from pyspark.errors import AnalysisException

from semcode_spark.sources.staging import glob_filter, stage_pages
from semcode_spark.sources.webpages import synth_web_pages


def test_stage_with_ignore_globs(spark, tmp_path):
    pages = synth_web_pages(spark, 200)
    out = str(tmp_path / "staged")
    n = stage_pages(pages, out, ignore_globs=["*/page/1?", "*site9*"])
    staged = spark.read.parquet(out)
    assert n == staged.count() < 200
    urls = [r["url"] for r in staged.collect()]
    assert not any(u.startswith("https://site9") for u in urls)
    assert not any(u.endswith(("/page/10", "/page/19")) for u in urls)


def test_force_semantics(spark, tmp_path):
    pages = synth_web_pages(spark, 50)
    out = str(tmp_path / "staged2")
    stage_pages(pages, out)
    with pytest.raises(AnalysisException):  # exists and force=False
        stage_pages(pages, out)
    assert stage_pages(pages, out, force=True) == 50  # overwrite ok
