from crawler_spark.functions import text, urls  # noqa: F401
