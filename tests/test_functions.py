"""Column-function parity vs independent Python implementations."""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F

from crawler_spark.functions import urls as U


def test_image_key_parity_with_python(spark):
    cases = [
        "http://a.test/img/x.png",
        "http://a.test/" + "p" * 50,
        "http://a.test/" + "p" * 400,  # b64 > 200 → md5 fallback
        "http://a.test/img/带汉字.png",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.k for r in df.select("url", U.image_key(F.col("url")).alias("k")).collect()}
    for u in cases:
        b64 = base64.urlsafe_b64encode(u.encode()).decode()
        want = hashlib.md5(u.encode()).hexdigest() if len(b64) > 200 else b64
        assert got[u] == want, u


def test_file_extension_rules(spark):
    cases = {
        "http://x/a.png": "png",
        "http://x/a.jpeg?v=1": "jpeg",
        "http://x/a.verylongext": "",
        "http://x/noext": "",
        "http://x/a.tar.gz": "gz",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.e for r in df.select("url", U.file_extension(F.col("url")).alias("e")).collect()}
    assert got == cases


def test_canonicalize_column_vs_full_udf(spark):
    cases = [
        "HTTP://Example.COM:80/Path#frag",
        "https://a.test:443/x",
        "https://a.test:8443/x",
        "http://a.test",
        "http://A.Test/p?z=1",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    out = df.select(
        U.canonicalize(F.col("url")).alias("fast"),
        U.canonicalize_full()(F.col("url")).alias("full"),
    ).collect()
    for r in out:
        assert r.fast == r.full, (r.fast, r.full)
    fast = {c: r.fast for c, r in zip(cases, out)}
    assert fast["HTTP://Example.COM:80/Path#frag"] == "http://example.com/Path"
    assert fast["https://a.test:8443/x"] == "https://a.test:8443/x"
    assert fast["http://a.test"] == "http://a.test/"


def test_is_url_matches_reference_rule(spark):
    cases = {
        "http://a.test/x": True,
        "ftp://files/x": True,
        "file://local/x": True,
        "gopher://old/x": False,
        "not a url": False,
        "http://a.test/x|y": True,   # '|' allowed mid-URL by tools.go:188
        "http://a.test/x;": False,   # ';' not allowed as last char
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.ok for r in df.select("url", U.is_url(F.col("url")).alias("ok")).collect()}
    assert got == cases
