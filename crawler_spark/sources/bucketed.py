"""Bucketed (co-located) tables — the shuffle-free recurring-join layer.

The engine's heaviest recurring join is frontier×url_seen on ``url_hash``
(J1, every generation; /root/reference/plugin/public/tools.go:339,380 probes
its seen map the same way per listing row).  As plain parquet both sides
re-shuffle on every generation — at a 10^10-URL frontier that exchange IS
the job.  Spark's answer is table bucketing: write both sides
``bucketBy(B, key)`` + ``sortBy(key)``; every later equi-join or groupBy on
the key reuses the on-disk hash distribution, and the physical plan contains
ZERO Exchange (pinned by tests/test_bucketed.py on the executed plan).

This is the same layout contract the bench's executor shards and
``arrow_frontier``'s host_bucket cogroup rely on, made durable in the store:

- ``write_bucketed``     — bucketBy/sortBy saveAsTable at an explicit path;
- ``register_bucketed``  — re-attach the bucket metadata in a NEW session
  (``CREATE TABLE … USING PARQUET CLUSTERED BY … INTO n BUCKETS LOCATION``)
  — bucketing lives in the catalog, not the files, so resume must re-declare
  it; idempotent;
- ``read_bucketed``      — register-if-absent + ``spark.table``.

On a real cluster the same contract is an Iceberg ``bucket(B, key)``
partition transform (the IcebergWarehouse path); B is chosen so one bucket
≈ one executor-core's working set (the buckets ≫ cores rule — see
BENCH/BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _keys(key: str | list[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str | list[str],
    buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted table at ``path``.

    ``sortBy(key)`` makes every bucket file key-sorted, so the later join is
    a zero-exchange, zero-sort merge — the scan itself satisfies both the
    distribution and the ordering requirement.  ``key`` may be a composite
    (e.g. ["judge", "pid"] for the seen-set).
    """
    ks = _keys(key)
    (
        df.write.mode(mode)
        .bucketBy(buckets, ks[0], *ks[1:])
        .sortBy(ks[0], *ks[1:])
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    key: str | list[str],
    buckets: int,
) -> None:
    """Attach bucket metadata for an existing bucketed-parquet directory in
    a fresh session (idempotent).  Required on resume: parquet files carry
    no bucketing spec — the catalog does."""
    kl = ", ".join(_keys(key))
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING PARQUET "
        f"CLUSTERED BY ({kl}) SORTED BY ({kl}) INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def read_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    key: str | list[str],
    buckets: int,
) -> DataFrame:
    """The table with its bucket distribution visible to the planner."""
    register_bucketed(spark, name, path, schema_ddl, key, buckets)
    return spark.table(name)
