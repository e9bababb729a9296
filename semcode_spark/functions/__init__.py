from semcode_spark.functions.tokenize import tokens_col, tokenize_query  # noqa: F401
from semcode_spark.functions.hashing import md5_long_col  # noqa: F401
