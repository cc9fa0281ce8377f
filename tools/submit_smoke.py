"""spark-submit smoke job: proves the engine runs from --py-files alone
(no repo checkout on executors) — one frontier dequeue generation.

    python tools/package.py /tmp/engine.zip
    spark-submit --master 'local[8]' --py-files /tmp/engine.zip \
        tools/submit_smoke.py
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crawler_spark.operators.arrow_frontier import canonicalize_stage, dequeue_keys


def main() -> None:
    spark = SparkSession.builder.appName("submit_smoke").getOrCreate()
    n, hosts = 200_000, 200
    urls = spark.range(0, n, 1, 16).select(
        F.concat(
            F.lit("HTTP://Host-"),
            F.pmod(F.xxhash64("id"), F.lit(hosts)).cast("string"),
            F.lit(".Test:80/p/"),
            F.col("id").cast("string"),
        ).alias("url")
    )
    frontier = canonicalize_stage(urls).select(
        "url_hash", F.xxhash64("host").alias("host_hash")
    )
    seen = frontier.filter(F.col("url_hash") % 2 == 0)
    out = dequeue_keys(frontier, seen, budget_per_host=1000, num_buckets=16)
    print(f"SUBMIT_SMOKE_OK rows={out.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
