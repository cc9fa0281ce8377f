"""File ingest: explicit schema, malformed rows quarantined not dropped."""

from __future__ import annotations

import tempfile
from pathlib import Path

from crawler_spark.sources.files import load_with_quarantine

DDL = "doc_id bigint, text string"


def test_jsonl_quarantine_split(spark):
    root = Path(tempfile.mkdtemp(prefix="files_"))
    p = root / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "beta"}\n'
        '{"doc_id": "not-a-number", "text": "gamma"}\n'
    )
    good, quarantine = load_with_quarantine(spark, str(p), DDL, fmt="jsonl")
    rows = {(r.doc_id, r.text) for r in good.collect()}
    assert rows == {(1, "alpha"), (2, "beta")}
    assert good.columns == ["doc_id", "text"]  # corrupt col stripped
    bad = [r._corrupt for r in quarantine.collect()]
    # malformed rows preserved VERBATIM for audit/replay
    assert "this is not json at all" in bad
    assert any("not-a-number" in b for b in bad)
    assert len(bad) == 2


def test_csv_quarantine_split(spark):
    root = Path(tempfile.mkdtemp(prefix="files_"))
    p = root / "docs.csv"
    p.write_text(
        "doc_id,text\n"
        "1,alpha\n"
        "junk-without-number,beta\n"
        "2,gamma\n"
    )
    good, quarantine = load_with_quarantine(spark, str(p), DDL, fmt="csv")
    assert {(r.doc_id, r.text) for r in good.collect()} == {
        (1, "alpha"),
        (2, "gamma"),
    }
    assert quarantine.count() == 1


def test_parquet_path_enforces_projection(spark):
    root = Path(tempfile.mkdtemp(prefix="files_"))
    spark.createDataFrame(
        [(1, "a", "extra")], "doc_id bigint, text string, other string"
    ).write.parquet(str(root / "t"))
    good, quarantine = load_with_quarantine(
        spark, str(root / "t"), DDL, fmt="parquet"
    )
    assert good.columns == ["doc_id", "text"]
    assert quarantine.count() == 0


def test_parquet_ingest_comma_carrying_types(spark, tmp_path):
    """ADVICE-r3: DDL schemas whose types contain commas (decimal(20,6),
    struct<...>) must parse to the right column names for the parquet
    branch (a naive split on ',' turned '6)' into a column name)."""
    from crawler_spark.sources.files import load_with_quarantine

    p = str(tmp_path / "t.parquet")
    spark.sql(
        "SELECT CAST(1.5 AS decimal(20,6)) AS amount, "
        "named_struct('a', 1, 'b', 'x') AS meta, 'k1' AS key"
    ).write.parquet(p)
    ddl = "amount decimal(20,6), meta struct<a:int,b:string>, key string"
    good, quarantine = load_with_quarantine(spark, p, ddl, fmt="parquet")
    assert good.columns == ["amount", "meta", "key"]
    assert good.count() == 1 and quarantine.count() == 0
