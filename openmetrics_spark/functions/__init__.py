from openmetrics_spark.functions.hashing import (  # noqa: F401
    portable_hash60,
    portable_hash60_sql,
    xxhash64_str,
    xxhash64_udf,
)
