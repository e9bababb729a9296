from semcode_spark.operators import blocks  # noqa: F401
