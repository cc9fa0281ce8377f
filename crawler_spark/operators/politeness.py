"""Politeness + robots — SURVEY §2.7 C1/C5.

The reference's politeness is a fixed pre-request sleep
(/root/reference/plugin/public/tools.go:51,58); robots.txt handling is
ABSENT in the reference (SURVEY C5) but required by the north_rule, so it is
a first-class stage here:

- robots.txt bodies (fetched like any frontier row) are parsed into
  (host, robots_disallow[], crawl_delay_ms) — a tiny per-host table;
- the frontier is filtered with a pure-column allow predicate
  (``F.exists`` over the disallow prefixes — no Python);
- the effective per-host delay is max(min_delay_ms, crawl_delay_ms) and the
  post-generation ``next_allowed_ts`` carries into the next generation's
  host_state (cross-batch politeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.urls import url_path


def parse_robots(robots_results: DataFrame) -> DataFrame:
    """Parse fetched robots.txt bodies → host_state columns.

    Input: fetch-stage output rows for the robots URLs (host, status, body).
    Pure column ops: split lines, filter directives, aggregate per host.
    A missing/failed robots.txt ⇒ allow-all, no crawl delay (standard
    robots semantics).
    """
    lines = robots_results.select(
        "host",
        F.explode(
            F.split(F.coalesce(F.col("body").cast("string"), F.lit("")), "\n")
        ).alias("line"),
    )
    parsed = lines.select(
        "host",
        F.regexp_extract("line", r"^Disallow:\s*(\S+)", 1).alias("disallow"),
        F.regexp_extract("line", r"^Crawl-delay:\s*([0-9.]+)", 1).alias("delay_s"),
    )
    return parsed.groupBy("host").agg(
        F.filter(F.collect_list("disallow"), lambda x: x != "").alias("robots_disallow"),
        F.coalesce(
            (F.max(F.when(F.col("delay_s") != "", F.col("delay_s")).cast("double")) * 1000)
            .cast("int"),
            F.lit(0),
        ).alias("crawl_delay_ms"),
    )


def robots_allowed(url, disallow_col) -> "F.Column":
    """Allow predicate: no disallow prefix matches the URL path."""
    path = url_path(url)
    return ~F.exists(
        F.coalesce(disallow_col, F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )


def apply_robots(frontier: DataFrame, host_state: DataFrame) -> DataFrame:
    """C5 — drop frontier rows disallowed by their host's robots rules and
    attach the effective politeness delay. host_state is per-host (tiny →
    broadcast join)."""
    hs = host_state.select(
        "host",
        "robots_disallow",
        F.coalesce("crawl_delay_ms", F.lit(0)).alias("crawl_delay_ms"),
        F.coalesce("min_delay_ms", F.lit(200)).alias("host_min_delay_ms"),
        "next_allowed_ts",
    )
    joined = frontier.drop("min_delay_ms", "next_allowed_ts").join(
        F.broadcast(hs), on="host", how="left"
    )
    eff_delay = F.greatest(
        F.coalesce(F.col("host_min_delay_ms"), F.lit(200)),
        F.coalesce(F.col("crawl_delay_ms"), F.lit(0)),
    )
    return (
        joined.filter(robots_allowed(F.col("url"), F.col("robots_disallow")))
        .withColumn("min_delay_ms", eff_delay)
        .drop("robots_disallow", "crawl_delay_ms", "host_min_delay_ms")
    )


def next_host_state(
    fetch_results: DataFrame, prior_host_state: DataFrame
) -> DataFrame:
    """Carry per-host clocks forward: next_allowed_ts = max(fetched_at) +
    effective delay. Prior robots rules are kept (they are refetched on a
    TTL in a real deployment)."""
    last = fetch_results.groupBy("host").agg(
        F.max("fetched_at").alias("last_ts"),
        F.max("min_delay_ms").alias("eff_delay_ms"),
    )
    return (
        prior_host_state.alias("p")
        .join(last.alias("l"), on="host", how="left")
        .select(
            "host",
            "min_delay_ms",
            "robots_disallow",
            "crawl_delay_ms",
            F.coalesce(
                F.col("l.last_ts") + F.col("l.eff_delay_ms") / 1000.0,
                F.col("p.next_allowed_ts"),
            ).alias("next_allowed_ts"),
        )
    )
