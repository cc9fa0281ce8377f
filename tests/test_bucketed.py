"""Bucketed co-located joins: the physical plan must contain NO Exchange.

The claim "the host-bucketed store co-partitions, so the recurring seen-join
does not shuffle" is an executed-plan property — these tests pin it, plus
the resume path (bucket metadata re-attached in a fresh catalog entry) and
result parity with the plain shuffled join.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_tables(spark, root: str, n: int = 50_000, buckets: int = 8):
    from crawler_spark.sources.bucketed import write_bucketed

    frontier = spark.range(n).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        (F.col("id") % 97).alias("priority"),
    )
    seen = spark.range(0, n, 2).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    write_bucketed(frontier, "t_frontier_b", f"{root}/frontier", "url_hash", buckets)
    write_bucketed(seen, "t_seen_b", f"{root}/seen", "url_hash", buckets)
    return frontier, seen


def test_bucketed_join_has_no_exchange_and_matches_shuffled(spark):
    root = tempfile.mkdtemp(prefix="bucketed_")
    frontier, seen = _mk_tables(spark, root)

    # the co-location win is the BIG×BIG case — disable auto-broadcast so
    # the planner faces the shape it has at 10^10 keys (both sides too big
    # to broadcast); with bucketed tables the merge join then needs neither
    # an exchange nor a sort
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fb, sb = spark.table("t_frontier_b"), spark.table("t_seen_b")
        joined = fb.join(sb, "url_hash", "left_anti")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # bucket files are key-sorted: the merge join needs no Sort either
        assert "SortMergeJoin" in plan

        # parity with the plain (shuffling) anti-join
        want = sorted(
            r.url_hash
            for r in frontier.join(seen, "url_hash", "left_anti").collect()
        )
        got = sorted(r.url_hash for r in joined.collect())
        assert got == want and len(got) > 0

        # groupBy on the bucket key also reuses the distribution
        agg = fb.groupBy("url_hash").agg(F.sum("priority").alias("p"))
        assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_resume_reattaches_metadata(spark):
    """A fresh catalog entry (new table name, same files) must recover the
    no-exchange property via CREATE TABLE ... CLUSTERED BY."""
    from crawler_spark.sources.bucketed import read_bucketed

    root = tempfile.mkdtemp(prefix="bucketed_resume_")
    _mk_tables(spark, root)
    spark.sql("DROP TABLE t_frontier_b")
    spark.sql("DROP TABLE t_seen_b")

    fb = read_bucketed(
        spark, "t_frontier_r", f"{root}/frontier",
        "url_hash BIGINT, priority BIGINT", "url_hash", 8,
    )
    sb = read_bucketed(
        spark, "t_seen_r", f"{root}/seen", "url_hash BIGINT", "url_hash", 8
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = fb.join(sb, "url_hash", "left_anti")
        assert "Exchange" not in _plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    # files on disk are what they were — registration is metadata-only
    assert any(Path(f"{root}/frontier").glob("*.parquet"))


def test_warehouse_bucketed_snapshot_commit_gated_and_colocated(spark):
    """stage_snapshot_bucketed honors the commit protocol (invisible until
    the manifest lands) and the committed snapshot joins co-located."""
    from crawler_spark.sources.warehouse import ParquetWarehouse

    root = tempfile.mkdtemp(prefix="wh_bucketed_")
    wh = ParquetWarehouse(root, spark)
    seen = spark.range(0, 10_000, 2).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    wh.stage_snapshot_bucketed("url_seen", seen, 0, "url_hash", buckets=8)
    ddl = "url_hash BIGINT"
    # staged-but-uncommitted is invisible (W4)
    assert wh.read_snapshot_bucketed("url_seen", ddl, "url_hash", 8) is None
    wh.commit(0)
    sb = wh.read_snapshot_bucketed("url_seen", ddl, "url_hash", 8)
    assert sb is not None and sb.count() == 5_000

    frontier = spark.range(10_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    froot = tempfile.mkdtemp(prefix="wh_frontier_")
    from crawler_spark.sources.bucketed import write_bucketed

    write_bucketed(frontier, "t_front_wh", f"{froot}/f", "url_hash", 8)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_front_wh").join(sb, "url_hash", "left_anti")
        assert "Exchange" not in _plan(joined)
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucket_spec_drift_is_rejected(spark):
    """Reading a bucketed snapshot with a different (key, buckets) than it
    was written with must raise, never silently mis-register the layout;
    plain-parquet history read as bucketed must raise too (the run.py
    resume path catches it and falls back to the plain read)."""
    import pytest

    from crawler_spark.sources.warehouse import BucketSpecError, ParquetWarehouse

    root = tempfile.mkdtemp(prefix="wh_spec_")
    wh = ParquetWarehouse(root, spark)
    df = spark.range(100).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    wh.stage_snapshot_bucketed("url_seen", df, 0, "url_hash", buckets=8)
    wh.commit(0)
    ddl = "url_hash BIGINT"
    with pytest.raises(BucketSpecError, match="written with bucket spec"):
        wh.read_snapshot_bucketed("url_seen", ddl, "url_hash", buckets=16)
    with pytest.raises(BucketSpecError, match="bucket spec"):
        wh.read_snapshot_bucketed("url_seen", ddl, ["url_hash", "x"], 8)
    # matching spec still reads fine
    assert wh.read_snapshot_bucketed("url_seen", ddl, "url_hash", 8).count() == 100

    # plain-parquet generation: bucketed read refuses
    wh2 = ParquetWarehouse(tempfile.mkdtemp(prefix="wh_plain_"), spark)
    wh2.stage_snapshot("url_seen", df, 0)
    wh2.commit(0)
    with pytest.raises(BucketSpecError, match="no _bucketspec.json"):
        wh2.read_snapshot_bucketed("url_seen", ddl, "url_hash", 8)


def test_bucketed_time_travel(spark):
    """as_of_generation on bucketed snapshots reads the historical layout
    (Iceberg VERSION AS OF parity for the co-located store)."""
    from crawler_spark.sources.warehouse import ParquetWarehouse

    root = tempfile.mkdtemp(prefix="wh_tt_")
    wh = ParquetWarehouse(root, spark)
    for g, n in ((0, 100), (1, 250)):
        df = spark.range(n).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash")
        )
        wh.stage_snapshot_bucketed("url_seen", df, g, "url_hash", buckets=4)
        wh.commit(g)
    ddl = "url_hash BIGINT"
    assert wh.read_snapshot_bucketed("url_seen", ddl, "url_hash", 4).count() == 250
    assert (
        wh.read_snapshot_bucketed(
            "url_seen", ddl, "url_hash", 4, as_of_generation=0
        ).count()
        == 100
    )
