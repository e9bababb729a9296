from semcode_spark.fixtures.queries import REFERENCE_QUERIES  # noqa: F401
