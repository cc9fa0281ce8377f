"""File ingest — schema-enforced JSONL/CSV/parquet readers with quarantine.

Training-data pipelines ingest third-party dumps (JSONL exports, CSV logs)
alongside the engine's own parquet tables.  Two rules that matter at 100 TB,
both enforced here:

- **explicit schema, never inference**: ``inferSchema``/sampling is a full
  extra pass over the input and yields run-dependent types; every reader
  takes a DDL string and nothing else.
- **per-row failure isolation (the C3 rule for file sources)**: malformed
  rows must not fail the task or silently vanish.  PERMISSIVE mode routes
  them into a ``_corrupt`` column; :func:`load_with_quarantine` splits the
  scan into (good, quarantine) frames so the bad rows land in an auditable
  table instead of a log line.

The raw frame is persisted before the split, so both branches come from ONE
scan of the input — also required by Spark itself, which disallows querying
only the corrupt column straight off a raw JSON/CSV scan
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).  Callers should
``unpersist`` the parents when done if the input is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """JSON-lines scan with explicit schema + corrupt-record capture."""
    return spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string").option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", CORRUPT_COL).json(path)


def read_csv(
    spark: SparkSession, path: str, schema_ddl: str, header: bool = True
) -> DataFrame:
    """CSV scan with explicit schema + corrupt-record capture."""
    return (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def load_with_quarantine(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    fmt: str = "jsonl",
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows without the corrupt column, malformed
    rows as (``_corrupt`` verbatim source line/record) for audit + replay.
    """
    if fmt == "jsonl":
        raw = read_jsonl(spark, path, schema_ddl)
    elif fmt == "csv":
        raw = read_csv(spark, path, schema_ddl)
    elif fmt == "parquet":
        # parquet is self-describing + checksummed; no row-level corruption
        # mode exists — schema enforcement happens via the explicit select
        df = spark.read.parquet(path)
        cols = _ddl_field_names(schema_ddl)
        return df.select(*cols), spark.createDataFrame(
            [], f"{CORRUPT_COL} string"
        )
    else:
        raise ValueError(f"unknown format {fmt!r} (jsonl|csv|parquet)")
    from pyspark import StorageLevel

    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, quarantine


def _ddl_field_names(schema_ddl: str) -> list[str]:
    """Top-level column names of a DDL schema string, via Spark's own DDL
    parser — a naive split on ',' breaks for comma-carrying types
    (``decimal(20,6)``, ``struct<...>``, ``map<...>``)."""
    from pyspark.sql.types import StructType

    return StructType.fromDDL(schema_ddl).fieldNames()
