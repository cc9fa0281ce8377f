"""End-to-end crawl over the four REAL wire formats (adapterweb +
run_adapters): each judge family lands normalized problems in the warehouse,
the seen-set gates generation 2 down to the refresh budget, and fetched
images decode to the served pixels."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_adapter_crawl_end_to_end(spark, tmp_path_factory):
    from crawler_spark.plans.run_adapters import run_crawl
    from crawler_spark.sources import adapterweb as AW
    from crawler_spark.sources import codecs
    from crawler_spark.sources.warehouse import ParquetWarehouse

    whdir = str(tmp_path_factory.mktemp("aw"))
    web = AW.AdapterWeb(n_pids=6)
    metrics = run_crawl(spark, whdir, web, generations=2, limit=4)
    wh = ParquetWarehouse(whdir, spark)

    # generation 0: first crawl — every pid is due (unbounded delta pass)
    assert metrics[0]["problems"] == 5 * 6
    # generation 1: nothing changed — random refresh fills to limit per judge
    assert metrics[1]["problems"] == 5 * 4

    probs = wh.read_appends("problems", as_of_generation=0)
    by_judge = {r.judge: r for r in probs.collect() if r.pid.endswith("1")}
    syz, lut, joy, uoj, bz = (
        by_judge[j] for j in ("syz", "lut", "joy", "uoj", "bzoj")
    )
    # normalized limits per family (reference semantics)
    assert (syz.time_ms, syz.memory_mb) == (1000, 256)
    assert (lut.time_ms, lut.memory_mb) == (2000, 512)
    assert (joy.time_ms, joy.memory_mb) == (500, 256)
    assert (uoj.time_ms, uoj.memory_mb) == (3000, 1024)
    assert (bz.time_ms, bz.memory_mb) == (10000, 162)  # bzoj.go:178-186
    assert syz.description_type == "markdown" and "# 题目描述" in syz.description
    assert "# Content" in lut.description and "# Samples" in lut.description
    assert joy.description.startswith("# joy1")
    assert uoj.description_type == "html" and "\n# Desc\n" in uoj.description
    assert syz.judge_type == "传统" and uoj.judge_type == "传统或交互"
    # bzoj (S11 session source): English 7-section template, html cleanup
    # applied ('<p>\s*'→'<p>', '<br>\n'→'<br>'), no span.red on odd pids
    assert bz.description_type == "html"
    assert "# Description" in bz.description and "# Source" in bz.description
    assert "<p>desc" in bz.description and "<br>more" in bz.description
    assert bz.judge_type == "传统"

    # seen-set covers all pids after gen 0
    seen = wh.read_snapshot("url_seen")
    assert seen.count() == 5 * 6

    # images: markdown (syzoj) + html (uoj, bzoj-behind-login) links were
    # extracted and the fetched bytes decode to exactly the served pixels
    images = wh.read_appends("images", as_of_generation=0)
    rows = images.collect()
    assert len(rows) == 18  # 6 syzoj + 6 uoj + 6 bzoj
    served = {
        u.split("\x01")[0]: b
        for u, b in web.pages.items()
        if u.split("\x01")[0].endswith(".png")
    }
    assert any(r.asset_url.startswith("http://bzoj.test/") for r in rows)
    for r in rows:
        truth = codecs.decode_png(served[r.asset_url])
        got = codecs.decode_png(bytes(r.bytes))
        assert (truth == got).all()
