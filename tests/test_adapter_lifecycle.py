"""End-to-end adapter lifecycle: each reference judge family (JSON / GraphQL
/ REST / HTML) flows through the REAL engine stages — fetch_stage (retries,
politeness, status columns) → adapter parse (wire schema + normalization) →
image-link extraction on the normalized description — proving the §2.8
pluggable-source contract inside the actual dataflow, not just in isolation.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

SYZOJ_BODY = json.dumps(
    {
        "success": True,
        "obj": {
            "title": "A", "description": "intro ![fig](/img/fig.png)",
            "input_format": "in", "output_format": "out", "example": "ex",
            "limit_and_hint": "hint", "time_limit": 1000, "memory_limit": 256,
            "have_additional_file": False, "file_io": False,
            "type": "traditional", "tags": [],
        },
    }
)
LUTECE_BODY = json.dumps(
    {
        "data": {
            "problem": {
                "title": "B", "content": "c", "standardInput": "si",
                "standardOutput": "so", "constraints": "ct", "note": "n",
                "limitation": {"timeLimit": 2000, "memoryLimit": 512},
                "samples": {"sampleList": [
                    {"inputContent": "1", "outputContent": "2"}]},
                "source": "s",
            }
        }
    }
)
JOYOI_BODY = json.dumps(
    {
        "code": 200, "msg": "",
        "data": {
            "id": "j1", "title": "C", "body": "# C body", "tags": "",
            "isVisible": True, "source": "Local",
            "timeLimitationPerCaseInMs": 500,
            "memoryLimitationPerCaseInByte": 134217728,
        },
    }
)
UOJ_BODY = (
    '<article class="top-buffer-md"><h3>Desc</h3>'
    "<p>时间限制：$3\\texttt{s}$</p><p>内存限制：$1\\texttt{GB}$</p></article>"
)


def test_all_adapter_kinds_through_fetch_and_parse(spark):
    from crawler_spark.operators.fetch import MappingFetcher, fetch_stage
    from crawler_spark.operators.images import extract_image_links
    from crawler_spark.sources.adapters import (
        parse_joyoi_problem,
        parse_lutece_problem,
        parse_syzoj_problem,
        parse_uoj_problem,
    )

    pages = {
        "http://syzoj.test/problem/s1/export": SYZOJ_BODY,
        "http://lutece.test/graphql:p-b1": LUTECE_BODY,
        "http://joyoi.test/api/problem/j1": JOYOI_BODY,
        "http://uoj.test/problem/u1": UOJ_BODY,
    }
    frontier = spark.createDataFrame(
        [
            ("syzoj", "json", "s1", "http://syzoj.test/problem/s1/export"),
            ("lutece", "graphql", "b1", "http://lutece.test/graphql:p-b1"),
            ("joyoi", "rest", "j1", "http://joyoi.test/api/problem/j1"),
            ("uoj", "html", "u1", "http://uoj.test/problem/u1"),
        ],
        "judge string, kind string, pid string, url string",
    ).withColumn("host", F.regexp_extract("url", r"^http://([^/]+)", 1)).withColumn(
        "generation", F.lit(0)
    )

    fetched = fetch_stage(
        frontier, MappingFetcher(pages, flaky="http://uoj.test/problem/u1"),
        num_buckets=4,
    ).cache()
    rows = {r.judge: r for r in fetched.collect()}
    assert all(r.status == "ok" for r in rows.values())
    assert rows["uoj"].attempts == 2  # retry envelope exercised (C2)

    bodies = fetched.select(
        "judge", "pid", F.col("body").cast("string").alias("body")
    )
    syzoj = parse_syzoj_problem(
        bodies.filter("judge = 'syzoj'"), home_url="http://syzoj.test"
    ).collect()[0]
    lutece = parse_lutece_problem(bodies.filter("judge = 'lutece'")).collect()[0]
    joyoi = parse_joyoi_problem(
        bodies.filter("judge = 'joyoi'"), src="Local", samples_col=None
    ).collect()[0]
    uoj = parse_uoj_problem(bodies.filter("judge = 'uoj'")).collect()[0]

    assert (syzoj.time_ms, syzoj.memory_mb) == (1000, 256)
    assert (lutece.time_ms, lutece.memory_mb) == (2000, 512)
    assert (joyoi.time_ms, joyoi.memory_mb) == (500, 128)
    assert (uoj.time_ms, uoj.memory_mb) == (3000, 1024)

    # unified downstream: image-link extraction (T1) over normalized output
    problems = spark.createDataFrame(
        [("syzoj", "s1", syzoj.url, syzoj.description, "markdown")],
        "judge string, pid string, url string, description string, "
        "description_type string",
    )
    links = extract_image_links(problems).collect()
    assert len(links) == 1 and links[0].src == "/img/fig.png"


def test_session_fetcher_login_once_and_auth_pages(spark):
    """S11: the session fetcher logs in once per worker, then presents the
    session token on every request; unauthenticated fetches 404."""
    from crawler_spark.operators.fetch import (
        MappingFetcher,
        SessionFetcher,
        fetch_stage,
    )

    token = "sess-42"
    pages = {"http://auth.test/login": token}
    for i in range(6):
        pages[f"http://auth.test/problem/{i}\x01{token}"] = f"body-{i}"

    frontier = spark.createDataFrame(
        [(f"http://auth.test/problem/{i}", "auth.test", 0) for i in range(6)],
        "url string, host string, generation int",
    )
    fetcher = SessionFetcher(MappingFetcher(pages), "http://auth.test/login")
    rows = fetch_stage(frontier, fetcher, num_buckets=2).collect()
    assert len(rows) == 6
    assert all(r.status == "ok" for r in rows)
    bodies = sorted(bytes(r.body).decode() for r in rows)
    assert bodies == [f"body-{i}" for i in range(6)]

    # without the session wrapper, the protected pages are invisible
    plain = fetch_stage(frontier, MappingFetcher(pages), num_buckets=2).collect()
    assert all(r.status == "error" for r in plain)
