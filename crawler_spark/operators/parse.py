"""Parse stage — SURVEY §2.1 S7 (listing extraction), §2.5 T4-T8.

The reference parses HTML with goquery CSS selectors
(/root/reference/plugin/uoj/uoj.go:55,81,109); here the listing/problem
shapes are extracted with ``regexp_extract_all`` + ``arrays_zip`` +
``posexplode`` — **entirely JVM-side column expressions**, no Python at all.
Per-judge adapters that genuinely need a DOM drop to a pandas UDF (the §2.8
adapter registry) — the synthetic shapes don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.text import extract_memory_mb, extract_time_ms

# listing row anchors as emitted by SynthWeb.listing_body (uoj-like shape)
_PID_RE = r'<a href="/problem/([^"]+)">'
_TITLE_RE = r"</a></td><td>([^<]+)</td>"
_PAGER_RE = r'<a class="page-link">(\d+)</a>'


def parse_listing(listing_results: DataFrame, page_size: int = 10) -> DataFrame:
    """Fetched listing pages → (judge, pid, title, listing_pos) rows.

    ``listing_pos`` is the global listing order: (page-1)*page_size + pos —
    crawl-order parity needs it (SURVEY §2.9).
    """
    ok = listing_results.filter(F.col("status") == "ok")
    body = F.col("body").cast("string")
    page = F.regexp_extract("url", r"page=(\d+)$", 1).cast("int")
    rows = ok.select(
        "judge",
        "host",
        page.alias("page"),
        F.arrays_zip(
            F.regexp_extract_all(body, F.lit(_PID_RE), 1).alias("pid"),
            F.regexp_extract_all(body, F.lit(_TITLE_RE), 1).alias("title"),
        ).alias("items"),
    )
    exploded = rows.select(
        "judge", "host", "page", F.posexplode("items").alias("pos", "item")
    )
    return exploded.select(
        "judge",
        "host",
        F.col("item.pid").alias("pid"),
        F.col("item.title").alias("title"),
        ((F.col("page") - 1) * page_size + F.col("pos")).cast("int").alias("listing_pos"),
    )


def extract_max_page(first_pages: DataFrame, sanity_bound: int = 500) -> DataFrame:
    """A4 + P2 — maxPage = max(int) over paginator tokens, bounded
    (reject <=0 or >= bound, e.g. uoj.go:72-74). Failure to find a paginator
    fails the listing phase (C4) — surfaced as max_page = NULL."""
    body = F.col("body").cast("string")
    tokens = F.transform(
        F.regexp_extract_all(body, F.lit(_PAGER_RE), 1), lambda x: x.cast("int")
    )
    mp = F.array_max(tokens)
    return first_pages.filter(F.col("status") == "ok").select(
        "judge",
        "host",
        F.when((mp > 0) & (mp < sanity_bound), mp).alias("max_page"),
    )


def parse_problem(problem_results: DataFrame) -> DataFrame:
    """Fetched problem pages → problems rows (title, limits, description).

    Mirrors the reference normalization: title from the page header, limits
    from prose with unit arithmetic (T7, uoj.go:121-144), description = the
    5-section markdown tail (T5). Failed fetches keep their listing entry
    with status='error' and NULL fields (C3/W3 semantics).
    """
    body = F.col("body").cast("string")
    parsed_title = F.regexp_extract(body, r"<h1>([^<]*)</h1>", 1)
    desc = F.regexp_extract(body, r"(?s)\n(# .*)$", 1)
    return problem_results.select(
        "judge",
        "pid",
        F.when(F.col("status") == "ok", parsed_title).otherwise(F.col("title")).alias("title"),
        "url",
        F.when(F.col("status") == "ok", extract_time_ms(body)).alias("time_ms"),
        F.when(F.col("status") == "ok", extract_memory_mb(body)).alias("memory_mb"),
        F.when(F.col("status") == "ok", F.lit("传统")).alias("judge_type"),
        F.when(F.col("status") == "ok", desc).alias("description"),
        F.when(F.col("status") == "ok", F.lit("markdown")).alias("description_type"),
        F.col("status"),
        "listing_pos",
        "crawl_seq",
        "generation",
    )
