"""Robots parsing + frontier filtering + delay merge (C1/C5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import apply_robots, parse_robots


def test_parse_robots(spark):
    body = b"User-agent: *\nDisallow: /private\nDisallow: /tmp\nCrawl-delay: 0.35\n"
    res = spark.createDataFrame(
        [("h.test", "ok", body), ("empty.test", "ok", b""), ("fail.test", "error", None)],
        "host string, status string, body binary",
    )
    rows = {r.host: r for r in parse_robots(res).collect()}
    assert sorted(rows["h.test"].robots_disallow) == ["/private", "/tmp"]
    assert rows["h.test"].crawl_delay_ms == 350
    assert rows["empty.test"].robots_disallow == [] and rows["empty.test"].crawl_delay_ms == 0
    assert rows["fail.test"].robots_disallow == []


def test_apply_robots_filters_and_merges_delay(spark):
    frontier = spark.createDataFrame(
        [
            ("http://h.test/ok/1", "h.test"),
            ("http://h.test/private/2", "h.test"),
            ("http://open.test/private/3", "open.test"),
        ],
        "url string, host string",
    )
    host_state = spark.createDataFrame(
        [
            ("h.test", 100, ["/private"], 250, None),
            ("open.test", 200, [], 0, None),
        ],
        "host string, min_delay_ms int, robots_disallow array<string>, "
        "crawl_delay_ms int, next_allowed_ts double",
    )
    out = apply_robots(frontier, host_state).collect()
    urls = sorted(r.url for r in out)
    assert urls == ["http://h.test/ok/1", "http://open.test/private/3"]
    delays = {r.url: r.min_delay_ms for r in out}
    # effective delay = max(min_delay, crawl_delay)
    assert delays["http://h.test/ok/1"] == 250
    assert delays["http://open.test/private/3"] == 200


def test_unknown_host_passes_with_default_delay(spark):
    frontier = spark.createDataFrame(
        [("http://new.test/x", "new.test")], "url string, host string"
    )
    host_state = spark.createDataFrame(
        [("h.test", 100, ["/x"], 0, None)],
        "host string, min_delay_ms int, robots_disallow array<string>, "
        "crawl_delay_ms int, next_allowed_ts double",
    )
    out = apply_robots(frontier, host_state).collect()
    assert len(out) == 1 and out[0].min_delay_ms == 200
