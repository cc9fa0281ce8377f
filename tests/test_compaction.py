"""Append-table compaction — the small-file problem (Iceberg
rewrite_data_files / expire_snapshots analog in ParquetWarehouse).

Every crawl generation appends shuffle.partitions-many files; a long-running
store's union scan then opens millions of tiny files.  Compaction must
rewrite history into few files WITHOUT changing any read result, keep time
travel before the bound until expiry, and compose with further appends and
re-compaction.
"""

from __future__ import annotations

from crawler_spark.sources.warehouse import ParquetWarehouse


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage_gen(spark, wh, g: int, n: int = 50):
    df = (
        spark.range(g * 1000, g * 1000 + n)
        .selectExpr("id", "CAST(id % 7 AS STRING) AS v")
        .repartition(4)
    )
    wh.stage_append("problems", df, g)
    wh.commit(g)


def test_compaction_preserves_reads_and_shrinks_files(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path), spark)
    for g in range(3):
        _stage_gen(spark, wh, g)
    before_all = _rows(wh.read_appends("problems"))
    before_g0 = _rows(wh.read_appends("problems", as_of_generation=0))

    m = wh.compact_appends("problems", target_file_bytes=1 << 30)
    assert m["files_before"] == 12 and m["files_after"] == 1
    assert m["through"] == 2

    # identical current view through one file
    assert _rows(wh.read_appends("problems")) == before_all
    # time travel BEFORE the bound still served by the kept gen dirs
    assert _rows(wh.read_appends("problems", as_of_generation=0)) == before_g0
    # time travel AT the bound uses the rewrite
    assert _rows(wh.read_appends("problems", as_of_generation=2)) == before_all


def test_compaction_composes_with_later_appends_and_recompaction(
    spark, tmp_path
):
    wh = ParquetWarehouse(str(tmp_path), spark)
    for g in range(2):
        _stage_gen(spark, wh, g)
    wh.compact_appends("problems", target_file_bytes=1 << 30)

    # appends after the bound union on top of the rewrite
    _stage_gen(spark, wh, 2)
    all3 = _rows(wh.read_appends("problems"))
    assert len(all3) == 150

    # re-compaction folds the rewrite + the new generation
    m2 = wh.compact_appends("problems", target_file_bytes=1 << 30)
    assert m2["through"] == 2 and m2["files_after"] == 1
    assert _rows(wh.read_appends("problems")) == all3


def test_expire_reclaims_superseded_dirs(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path), spark)
    for g in range(3):
        _stage_gen(spark, wh, g)
    current = _rows(wh.read_appends("problems"))
    wh.compact_appends("problems", target_file_bytes=1 << 30)
    removed = wh.expire_compacted("problems")
    assert removed == 3  # the three superseded gen dirs
    assert not list((tmp_path / "problems").glob("gen=*"))
    # current reads unaffected; only pre-bound time travel is gone
    assert _rows(wh.read_appends("problems")) == current


def test_unpublished_compaction_is_invisible(spark, tmp_path):
    """Crash before _compaction.json lands (W4/W5 for compaction): a
    leftover staging dir must not change any read, and re-running
    compaction restages cleanly."""
    wh = ParquetWarehouse(str(tmp_path), spark)
    for g in range(2):
        _stage_gen(spark, wh, g)
    before = _rows(wh.read_appends("problems"))
    # simulate the crash: data rewritten but the marker never published
    df = wh.read_appends("problems")
    (tmp_path / "problems" / ".compact_tmp").mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "problems" / ".compact_tmp")
    )
    assert _rows(wh.read_appends("problems")) == before
    m = wh.compact_appends("problems", target_file_bytes=1 << 30)
    assert m["files_after"] == 1
    assert _rows(wh.read_appends("problems")) == before
