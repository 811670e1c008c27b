"""Column-level function library (extension surface, SURVEY.md §2.4).

All hot-path functions are built from native ``pyspark.sql.functions``
higher-order expressions so they run inside whole-stage codegen on the
JVM — no Python in the loop. Pandas-UDF variants exist only where
semantics genuinely cannot be expressed natively (multimodal decode).
"""

from chronobase_spark.functions import similarity, text  # noqa: F401
