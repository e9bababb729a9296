from semcode_spark.plans.lineage import read_manifest, read_metrics, resume_plan  # noqa: F401
