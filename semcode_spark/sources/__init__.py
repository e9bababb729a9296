from semcode_spark.sources.tables import load_table, load_documents  # noqa: F401
from semcode_spark.sources.webpages import synth_web_pages  # noqa: F401
