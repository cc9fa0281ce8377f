"""Driver-oracle queries: every SURVEY §2 operator expressed over the
read-only testdata tables, with a DuckDB-equivalent SQL oracle.

Each entry is (spark_fn, oracle_sql). The Spark side uses the real engine
modules (crawler_spark.operators / functions) — these queries ARE the
operators, applied to the TPC-H-ish substrate per FIXTURES.md §B:

- documents → crawl listing (judge=source, pid=doc_id, title=text prefix)
- a deterministic slice of documents → the url_seen checkpoint
- events    → fetch_log stand-in (politeness gap checks)
- orders    → priority/top-k substrate

Determinism across engines: every "random" order is md5(seed‖key) — see
crawler_spark.operators.frontier (SURVEY §2.9 normative ordering).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions import text as TX
from crawler_spark.functions import urls as U
from crawler_spark.operators import frontier as FR
from crawler_spark.operators import membership as M

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# shared builders: the crawl-shaped views over the testdata tables
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a crawl listing: one judge per source."""
    return _t(spark, sf_dir, "documents").select(
        F.col("source").alias("judge"),
        F.col("doc_id").cast("string").alias("pid"),
        F.substring("text", 1, 24).alias("title"),
        F.col("doc_id").cast("int").alias("listing_pos"),
    )


LISTING_SQL = (
    "SELECT source AS judge, CAST(doc_id AS VARCHAR) AS pid, "
    "substr(text, 1, 24) AS title, CAST(doc_id AS INT) AS listing_pos "
    "FROM documents"
)


def _seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """url_seen checkpoint: every 3rd doc is seen; every 9th has a changed
    title (re-crawl trigger, tools.go:339)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return d.select(
        F.col("source").alias("judge"),
        F.col("doc_id").cast("string").alias("pid"),
        F.when(F.col("doc_id") % 9 == 0, F.lit("CHANGED"))
        .otherwise(F.substring("text", 1, 24))
        .alias("title"),
    )


SEEN_SQL = (
    "SELECT source AS judge, CAST(doc_id AS VARCHAR) AS pid, "
    "CASE WHEN doc_id % 9 = 0 THEN 'CHANGED' ELSE substr(text, 1, 24) END AS title "
    "FROM documents WHERE doc_id % 3 = 0"
)


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized problem-page URLs over documents."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".test/problem/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


DOC_URLS_SQL = (
    "SELECT doc_id, 'http://' || source || '.test/problem/' || "
    "CAST(doc_id AS VARCHAR) AS url FROM documents"
)


# ---------------------------------------------------------------------------
# §2.3 J1 + §2.4 A1-A3 + §2.9 — the flagship frontier-generation query
# ---------------------------------------------------------------------------


def q_frontier_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: given listing + seen set, emit this generation's fetch batch
    in normative crawl order (limit 10/judge, seed 'r1')."""
    out = FR.select_generation(
        _listing(spark, sf_dir), _seen(spark, sf_dir), limit=10, seed="r1"
    )
    return out.select(
        "judge", "pid", "title",
        F.col("is_due").cast("int").alias("is_due"),
        F.col("crawl_seq").cast("int").alias("crawl_seq"),
    )


SQL_FRONTIER_GENERATION = f"""
WITH listing AS ({LISTING_SQL}),
seen AS ({SEEN_SQL}),
flagged AS (
  SELECT l.judge, l.pid, l.title, l.listing_pos,
         (s.pid IS NULL OR s.title <> l.title) AS is_due
  FROM listing l LEFT JOIN seen s ON l.judge = s.judge AND l.pid = s.pid),
ranked AS (
  SELECT judge, pid, title, is_due,
         ROW_NUMBER() OVER (
           PARTITION BY judge
           ORDER BY is_due DESC,
                    CASE WHEN is_due THEN listing_pos END ASC NULLS LAST,
                    md5('r1' || judge || '|' || pid) ASC) AS crawl_seq
  FROM flagged)
SELECT judge, pid, title, CAST(is_due AS INT) AS is_due,
       CAST(crawl_seq AS INT) AS crawl_seq
FROM ranked WHERE is_due OR crawl_seq <= 10
"""


def q_frontier_generation_subpart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The at-scale selection path: identical semantics to
    frontier_generation but computed through the (judge, pid-bucket)
    pre-pruned window (select_generation(subpartitions=8)) — checked
    against the SAME single-window oracle SQL, proving the bucketed
    two-phase plan is output-equivalent."""
    out = FR.select_generation(
        _listing(spark, sf_dir), _seen(spark, sf_dir), limit=10, seed="r1",
        subpartitions=8,
    )
    return out.select(
        "judge", "pid", "title",
        F.col("is_due").cast("int").alias("is_due"),
        F.col("crawl_seq").cast("int").alias("crawl_seq"),
    )


def q_j1_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 not-seen half: listing rows whose (judge,pid) is absent from seen."""
    listing = _listing(spark, sf_dir)
    seen = _seen(spark, sf_dir).select("judge", "pid")
    return listing.join(seen, on=["judge", "pid"], how="left_anti").select(
        "judge", "pid", "title"
    )


SQL_J1_SEEN_ANTIJOIN = f"""
WITH listing AS ({LISTING_SQL}), seen AS ({SEEN_SQL})
SELECT l.judge, l.pid, l.title FROM listing l
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.judge = l.judge AND s.pid = l.pid)
"""


def q_j1_due_or_changed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 full predicate (tools.go:339): new OR title-changed rows."""
    flagged = M.due_or_changed(_listing(spark, sf_dir), _seen(spark, sf_dir))
    return flagged.filter("is_due").select("judge", "pid", "title")


SQL_J1_DUE_OR_CHANGED = f"""
WITH listing AS ({LISTING_SQL}), seen AS ({SEEN_SQL})
SELECT l.judge, l.pid, l.title
FROM listing l LEFT JOIN seen s ON l.judge = s.judge AND l.pid = s.pid
WHERE s.pid IS NULL OR s.title <> l.title
"""


def q_j3_chosen_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — update-set membership (lutece.go:134-138): semi-join listing vs
    the chosen set."""
    listing = _listing(spark, sf_dir)
    chosen = FR.select_generation(
        listing, _seen(spark, sf_dir), limit=10, seed="r1"
    ).select("judge", "pid")
    return listing.join(chosen, on=["judge", "pid"], how="left_semi").select(
        "judge", "pid", "title"
    )


SQL_J3_CHOSEN_SEMIJOIN = f"""
WITH gen AS ({SQL_FRONTIER_GENERATION}), listing AS ({LISTING_SQL})
SELECT l.judge, l.pid, l.title FROM listing l
WHERE EXISTS (SELECT 1 FROM gen g WHERE g.judge = l.judge AND g.pid = l.pid)
"""


def q_a1_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — seeded random top-k per group (ChooseUpdateProblem random fill,
    tools.go:344-352) over orders / o_orderpriority."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.concat(F.lit("s1"), F.col("o_orderkey").cast("string"))).asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rk")
    )


SQL_A1_PRIORITY_TOPK = """
SELECT o_orderpriority, o_orderkey, CAST(rk AS INT) AS rk FROM (
  SELECT o_orderpriority, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY md5('s1' || CAST(o_orderkey AS VARCHAR))) AS rk
  FROM orders) WHERE rk <= 5
"""


def q_a3_admission_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — per-judge batch caps (loj 200 / uoj 50 / … per BASELINE.md),
    exercised with a broadcast budgets table."""
    gen = FR.select_generation(
        _listing(spark, sf_dir), _seen(spark, sf_dir), limit=1_000_000, seed="r1"
    )
    judges = [f"src{i}" for i in range(20)]
    budgets = spark.createDataFrame(
        [(j, 3 if j in ("src0", "src1") else 7) for j in judges], "judge string, limit int"
    )
    out = FR.admission_budget(gen, budgets, default_limit=7)
    return out.select("judge", "pid", F.col("crawl_seq").cast("int").alias("crawl_seq"))


SQL_A3_ADMISSION_BUDGET = f"""
WITH listing AS ({LISTING_SQL}),
seen AS ({SEEN_SQL}),
flagged AS (
  SELECT l.judge, l.pid, l.title, l.listing_pos,
         (s.pid IS NULL OR s.title <> l.title) AS is_due
  FROM listing l LEFT JOIN seen s ON l.judge = s.judge AND l.pid = s.pid),
ranked AS (
  SELECT judge, pid,
         ROW_NUMBER() OVER (
           PARTITION BY judge
           ORDER BY is_due DESC,
                    CASE WHEN is_due THEN listing_pos END ASC NULLS LAST,
                    md5('r1' || judge || '|' || pid) ASC) AS crawl_seq
  FROM flagged)
SELECT judge, pid, CAST(crawl_seq AS INT) AS crawl_seq FROM ranked
WHERE crawl_seq <= (CASE WHEN judge IN ('src0','src1') THEN 3 ELSE 7 END)
"""


def q_a4_max_over_paginator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — maxPage = max(int(token)) over paginator candidates
    (syzoj/main.go:84-94), P2 sanity bound applied (reject ≥500)."""
    e = _t(spark, sf_dir, "events")
    cand = e.select(
        F.col("user_id").alias("judge_id"),
        F.col("event_id"),
        (F.col("event_id") % 700).cast("int").alias("page_token"),
    )
    return (
        cand.filter(F.col("page_token") < 500)
        .groupBy("judge_id")
        .agg(F.max("page_token").alias("max_page"))
    )


SQL_A4_MAX_OVER_PAGINATOR = """
SELECT user_id AS judge_id, MAX(CAST(event_id % 700 AS INT)) AS max_page
FROM events WHERE CAST(event_id % 700 AS INT) < 500 GROUP BY user_id
"""


def q_a5_seen_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — seen-set refresh: MERGE-style upsert (new listing wins,
    syzoj/main.go:127-130) emulated with full-outer + coalesce."""
    old = _seen(spark, sf_dir).withColumnRenamed("title", "old_title")
    new = _listing(spark, sf_dir).filter(F.col("listing_pos") % 2 == 0).select(
        "judge", "pid", F.col("title").alias("new_title")
    )
    return old.join(new, on=["judge", "pid"], how="full_outer").select(
        "judge", "pid",
        F.coalesce("new_title", "old_title").alias("title"),
    )


SQL_A5_SEEN_REFRESH = f"""
WITH old AS ({SEEN_SQL}),
new AS (SELECT judge, pid, title AS new_title FROM ({LISTING_SQL})
        WHERE listing_pos % 2 = 0)
SELECT COALESCE(o.judge, n.judge) AS judge, COALESCE(o.pid, n.pid) AS pid,
       COALESCE(n.new_title, o.title) AS title
FROM old o FULL OUTER JOIN new n ON o.judge = n.judge AND o.pid = n.pid
"""


# ---------------------------------------------------------------------------
# §2.1 scans (relational mappings) and §2.2 predicates
# ---------------------------------------------------------------------------


def q_s7_listing_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — paginated listing seed expansion: page URLs 1..maxPage per judge
    (maxPage derived from data, bounded by P2)."""
    d = _t(spark, sf_dir, "documents")
    pages = d.groupBy("source").agg(
        F.least(F.lit(12), (F.count("*") % 10 + 3)).cast("int").alias("max_page")
    )
    expanded = pages.select(
        "source", F.explode(F.sequence(F.lit(1), F.col("max_page"))).alias("page")
    )
    return expanded.select(
        F.col("source").alias("judge"),
        F.col("page").cast("int").alias("page"),
        F.format_string(
            "http://%s.test/problems?page=%d", F.col("source"), F.col("page")
        ).alias("url"),
    )


SQL_S7_LISTING_EXPAND = """
WITH pages AS (
  SELECT source, CAST(LEAST(12, COUNT(*) % 10 + 3) AS INT) AS max_page
  FROM documents GROUP BY source)
SELECT source AS judge, CAST(page AS INT) AS page,
       printf('http://%s.test/problems?page=%d', source, page) AS url
FROM pages, UNNEST(generate_series(1, max_page)) AS t(page)
"""


def q_s10_fixed_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 — fixed-range ID scan (tsinsen A1000..A1518, tsinsen.go:33-124)."""
    return spark.range(1000, 1519).select(
        F.concat(F.lit("A"), F.col("id").cast("string")).alias("pid"),
        F.format_string(
            "http://tsinsen.test/A%d", F.col("id")
        ).alias("url"),
    )


SQL_S10_FIXED_RANGE_SCAN = """
SELECT 'A' || CAST(i AS VARCHAR) AS pid,
       printf('http://tsinsen.test/A%d', i) AS url
FROM UNNEST(generate_series(1000, 1518)) AS t(i)
"""


def q_p1_url_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — IsUrl regex (tools.go:188-193) over a synthesized URL mix."""
    d = _t(spark, sf_dir, "documents")
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("http://"), F.col("source"), F.lit(".test/p/"),
                        F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("ftp://files.test/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("not a url "), F.col("source")))
        .otherwise(F.concat(F.lit("gopher://old.test/"), F.col("doc_id").cast("string")))
    )
    out = d.select("doc_id", url.alias("url"))
    return out.select("doc_id", "url", U.is_url(F.col("url")).cast("int").alias("is_valid"))


SQL_P1_URL_VALIDITY = r"""
WITH u AS (
  SELECT doc_id,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'http://' || source || '.test/p/' || CAST(doc_id AS VARCHAR)
      WHEN 1 THEN 'ftp://files.test/' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN 'not a url ' || source
      ELSE 'gopher://old.test/' || CAST(doc_id AS VARCHAR) END AS url
  FROM documents)
SELECT doc_id, url,
  CAST(regexp_matches(url,
    '^(https?|ftp|file)://[-A-Za-z0-9+&@#/%?=~_|!:,.;]+[-A-Za-z0-9+&@#/%=~_|]$')
    AS INT) AS is_valid
FROM u
"""


def q_p4_p6_link_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 oversized-link guard (>1000 chars, tools.go:210-212) + P6 extension
    extraction (tools.go:176-186)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://img.test/"),
        F.when(F.col("doc_id") % 10 == 0, F.repeat(F.lit("x"), 1200)).otherwise(
            F.col("doc_id").cast("string")
        ),
        F.when(F.col("doc_id") % 3 == 0, F.lit(".png"))
        .when(F.col("doc_id") % 3 == 1, F.lit(".jpeg?v=2"))
        .otherwise(F.lit(".verylongext")),
    )
    out = d.select("doc_id", url.alias("url"))
    return out.select(
        "doc_id",
        U.oversized_link(F.col("url")).cast("int").alias("skip_oversized"),
        U.file_extension(F.col("url")).alias("ext"),
    )


SQL_P4_P6_LINK_GUARDS = r"""
WITH u AS (
  SELECT doc_id, 'http://img.test/' ||
    (CASE WHEN doc_id % 10 = 0 THEN repeat('x', 1200) ELSE CAST(doc_id AS VARCHAR) END) ||
    (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '.png' WHEN 1 THEN '.jpeg?v=2'
     ELSE '.verylongext' END) AS url
  FROM documents),
e AS (
  SELECT doc_id, url,
    regexp_extract(regexp_replace(url, '\?.*$', ''), '\.([^./]*)$', 1) AS raw_ext
  FROM u)
SELECT doc_id, CAST(length(url) > 1000 AS INT) AS skip_oversized,
  CASE WHEN length(raw_ext) BETWEEN 1 AND 5 THEN raw_ext ELSE '' END AS ext
FROM e
"""


def q_p5_title_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — title whitespace strip + pid trim (syzoj/main.go:109-114)."""
    d = _t(spark, sf_dir, "documents")
    messy = F.concat(F.lit("  "), F.substring("text", 1, 12), F.lit("\n"),
                     F.substring("text", 13, 6), F.lit("  "))
    return d.select("doc_id", TX.strip_title(messy).alias("title"))


SQL_P5_TITLE_PROJECTION = r"""
SELECT doc_id,
  trim(regexp_replace('  ' || substr(text,1,12) || chr(10) || substr(text,13,6) || '  ',
       '[\n\r]', '', 'g')) AS title
FROM documents
"""


# ---------------------------------------------------------------------------
# §2.5 transforms
# ---------------------------------------------------------------------------


def q_t2_t3_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 md5 + T3 urlsafe-b64 + T1 image keying (b64, md5 fallback >200)."""
    u = _doc_urls(spark, sf_dir)
    long_url = F.concat(F.col("url"), F.when(F.col("doc_id") % 7 == 0,
                                             F.repeat(F.lit("/pad"), 60)).otherwise(F.lit("")))
    out = u.select("doc_id", long_url.alias("url"))
    return out.select(
        "doc_id",
        U.md5_hex(F.col("url")).alias("md5_hex"),
        U.urlsafe_b64(F.col("url")).alias("b64_key"),
        U.image_key(F.col("url")).alias("image_key"),
    )


SQL_T2_T3_KEYS = f"""
WITH u0 AS ({DOC_URLS_SQL}),
u AS (SELECT doc_id, url || (CASE WHEN doc_id % 7 = 0 THEN repeat('/pad', 60)
                             ELSE '' END) AS url FROM u0),
k AS (SELECT doc_id, url, md5(url) AS md5_hex,
             translate(to_base64(encode(url)), '+/', '-_') AS b64_key FROM u)
SELECT doc_id, md5_hex, b64_key,
       CASE WHEN length(b64_key) > 200 THEN md5_hex ELSE b64_key END AS image_key
FROM k
"""


def q_t1_link_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — image-link extraction: markdown ![..](url) + HTML <img src>
    regex passes (tools.go:205,242-244) over a synthesized description, then
    explode + relative-URL resolution (tools.go:216-221)."""
    d = _t(spark, sf_dir, "documents")
    desc = F.concat(
        F.lit("intro ![fig](img/"), F.col("doc_id").cast("string"), F.lit(".png) text "),
        F.lit("<img src=\"/static/"), F.col("doc_id").cast("string"), F.lit(".jpg\"> end"),
    )
    page_url = F.concat(F.lit("http://"), F.col("source"), F.lit(".test/problem/"),
                        F.col("doc_id").cast("string"), F.lit("/view"))
    base = d.select("doc_id", desc.alias("description"), page_url.alias("page_url"))
    md_links = F.regexp_extract_all(F.col("description"), F.lit(r"!\[[^\]]*\]\(([^)]+)\)"), 1)
    html_links = F.regexp_extract_all(F.col("description"), F.lit(r'<img src="([^"]+)"'), 1)
    links = base.select(
        "doc_id", "page_url",
        F.explode(F.concat(md_links, html_links)).alias("src"),
    )
    return links.select(
        "doc_id", "src",
        U.resolve_link(F.col("src"), F.col("page_url")).alias("resolved"),
    )


SQL_T1_LINK_EXTRACTION = r"""
WITH base AS (
  SELECT doc_id,
    'intro ![fig](img/' || CAST(doc_id AS VARCHAR) || '.png) text <img src="/static/'
      || CAST(doc_id AS VARCHAR) || '.jpg"> end' AS description,
    'http://' || source || '.test/problem/' || CAST(doc_id AS VARCHAR) || '/view' AS page_url
  FROM documents),
links AS (
  SELECT doc_id, page_url, unnest(
    list_concat(regexp_extract_all(description, '!\[[^\]]*\]\(([^)]+)\)', 1),
                regexp_extract_all(description, '<img src="([^"]+)"', 1))) AS src
  FROM base)
SELECT doc_id, src,
  CASE WHEN regexp_matches(src, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN src
       WHEN src LIKE '/%' THEN regexp_extract(page_url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1) || src
       ELSE regexp_replace(regexp_replace(page_url, '[?#].*$', ''), '/[^/]*$', '/') || src
  END AS resolved
FROM links
"""


def q_t5_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — description.md section templating (syzoj/main.go:191-213)."""
    d = _t(spark, sf_dir, "documents")
    out = d.select(
        "doc_id",
        TX.sections_markdown(
            [
                ("题目描述", F.substring("text", 1, 40)),
                ("输入格式", F.substring("text", 41, 20)),
                ("输出格式", F.substring("text", 61, 20)),
                ("样例", F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
                    F.substring("text", 81, 10))),
                ("数据范围与提示", F.substring("text", 91, 10)),
            ]
        ).alias("description_md"),
    )
    return out


SQL_T5_SECTIONS = """
SELECT doc_id,
  (CASE WHEN trim(substr(text,1,40)) <> '' THEN '# 题目描述' || chr(10) || chr(10) || trim(substr(text,1,40)) || chr(10) || chr(10) ELSE '' END) ||
  (CASE WHEN trim(substr(text,41,20)) <> '' THEN '# 输入格式' || chr(10) || chr(10) || trim(substr(text,41,20)) || chr(10) || chr(10) ELSE '' END) ||
  (CASE WHEN trim(substr(text,61,20)) <> '' THEN '# 输出格式' || chr(10) || chr(10) || trim(substr(text,61,20)) || chr(10) || chr(10) ELSE '' END) ||
  (CASE WHEN doc_id % 5 <> 0 AND trim(substr(text,81,10)) <> '' THEN '# 样例' || chr(10) || chr(10) || trim(substr(text,81,10)) || chr(10) || chr(10) ELSE '' END) ||
  (CASE WHEN trim(substr(text,91,10)) <> '' THEN '# 数据范围与提示' || chr(10) || chr(10) || trim(substr(text,91,10)) || chr(10) || chr(10) ELSE '' END)
  AS description_md
FROM documents
"""


def q_t6_heading_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 — uoj h3→heading rewrite (uoj.go:117-120) + bzoj cleanup."""
    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<h3>Statement</h3><p>   body "), F.substring("text", 1, 16),
        F.lit("</p><br>\nmore<h3> Input </h3>tail"),
    )
    out = d.select("doc_id", html.alias("html"))
    return out.select(
        "doc_id",
        TX.bzoj_html_cleanup(TX.h3_to_heading(F.col("html"))).alias("rewritten"),
    )


SQL_T6_HEADING_REWRITE = r"""
WITH h AS (
  SELECT doc_id, '<h3>Statement</h3><p>   body ' || substr(text,1,16) ||
         '</p><br>' || chr(10) || 'more<h3> Input </h3>tail' AS html
  FROM documents)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(html, '<h3[^>]*>\s*(.*?)\s*</h3>', chr(10) || '# \1' || chr(10) || chr(10), 'g'),
      '<p>\s+', '<p>', 'g'),
    '<br>' || chr(10), '<br>', 'g') AS rewritten
FROM h
"""


def q_t7_limit_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 — time/memory limit extraction from prose with unit arithmetic
    (uoj.go:121-144, bzoj.go:178-186)."""
    d = _t(spark, sf_dir, "documents")
    prose = F.concat(
        F.lit("时间限制 "), ((F.col("doc_id") % 5) + 1).cast("string"), F.lit(" s, "),
        F.lit("内存限制 "),
        F.when(F.col("doc_id") % 3 == 0, F.lit("1 GB")).otherwise(
            F.concat((((F.col("doc_id") % 4) + 1) * 128).cast("string"), F.lit(" MB"))
        ),
    )
    out = d.select("doc_id", prose.alias("prose"))
    return out.select(
        "doc_id",
        TX.extract_time_ms(F.col("prose")).alias("time_ms"),
        TX.extract_memory_mb(F.col("prose")).alias("memory_mb"),
    )


SQL_T7_LIMIT_EXTRACTION = r"""
WITH p AS (
  SELECT doc_id, '时间限制 ' || CAST(doc_id % 5 + 1 AS VARCHAR) || ' s, 内存限制 ' ||
    (CASE WHEN doc_id % 3 = 0 THEN '1 GB'
     ELSE CAST((doc_id % 4 + 1) * 128 AS VARCHAR) || ' MB' END) AS prose
  FROM documents)
SELECT doc_id,
  CAST(CAST(regexp_extract(prose, '(\d+(?:\.\d+)?)\s*s', 1) AS DOUBLE) * 1000 AS INT) AS time_ms,
  CAST(CASE WHEN regexp_extract(prose, '\d+\s*([MG])B', 1) = 'G'
       THEN CAST(regexp_extract(prose, '(\d+)\s*[MG]B', 1) AS INT) * 1024
       ELSE CAST(regexp_extract(prose, '(\d+)\s*[MG]B', 1) AS INT) END AS INT) AS memory_mb
FROM p
"""


def q_t8_judge_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 — judge-type classification (uoj.go:153-157 + syzoj tag scan)."""
    d = _t(spark, sf_dir, "documents")
    time_ms = F.when(F.col("doc_id") % 11 == 0, F.lit(0)).otherwise(
        ((F.col("doc_id") % 5) + 1) * 1000
    )
    ptype = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("submit-answer"))
        .when(F.col("doc_id") % 7 == 1, F.lit("interaction"))
        .otherwise(F.lit("traditional"))
    )
    tags = F.when(
        F.col("doc_id") % 13 == 0, F.array(F.lit("Special Judge"), F.lit("dp"))
    ).otherwise(F.array(F.lit("dp")))
    out = d.select("doc_id", time_ms.alias("time_ms"), ptype.alias("ptype"),
                   tags.alias("tags"))
    return out.select(
        "doc_id",
        TX.judge_type_uoj(F.col("time_ms")).alias("jt_uoj"),
        TX.judge_type_syzoj(F.col("ptype"), F.col("tags")).alias("jt_syzoj"),
    )


SQL_T8_JUDGE_TYPE = """
WITH x AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 0 ELSE (doc_id % 5 + 1) * 1000 END AS time_ms,
    CASE CAST(doc_id % 7 AS INT) WHEN 0 THEN 'submit-answer' WHEN 1 THEN 'interaction'
         ELSE 'traditional' END AS ptype,
    (doc_id % 13 = 0) AS special
  FROM documents)
SELECT doc_id,
  CASE WHEN time_ms = 0 THEN '提交答案' ELSE '传统或交互' END AS jt_uoj,
  (CASE ptype WHEN 'submit-answer' THEN '提交答案' WHEN 'interaction' THEN '交互'
        ELSE '传统' END) || (CASE WHEN special THEN ' (Special Judge)' ELSE '' END) AS jt_syzoj
FROM x
"""


def q_t9_t10_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 NBSP split (bzoj.go:114) + T10 markdown guard (joyoi.go:142-144)."""
    d = _t(spark, sf_dir, "documents")
    pager = F.concat(F.lit("1 2 "), ((F.col("doc_id") % 9) + 3).cast("string"))
    body = F.when(F.col("doc_id") % 2 == 0,
                  F.concat(F.lit("# Title\n"), F.substring("text", 1, 10))).otherwise(
        F.substring("text", 1, 10)
    )
    out = d.select("doc_id", pager.alias("pager"), body.alias("body"))
    return out.select(
        "doc_id",
        F.element_at(TX.nbsp_split(F.col("pager")), -1).alias("last_page_token"),
        TX.markdown_guard(F.col("body")).alias("guarded_body"),
    )


SQL_T9_T10_GUARDS = """
WITH x AS (
  SELECT doc_id,
    '1' || chr(160) || '2' || chr(160) || CAST(doc_id % 9 + 3 AS VARCHAR) AS pager,
    CASE WHEN doc_id % 2 = 0 THEN '# Title' || chr(10) || substr(text,1,10)
         ELSE substr(text,1,10) END AS body
  FROM documents)
SELECT doc_id,
  list_extract(string_split(pager, chr(160)), -1) AS last_page_token,
  CASE WHEN body NOT LIKE '#%' THEN '# ' || chr(10) || body ELSE body END AS guarded_body
FROM x
"""


# ---------------------------------------------------------------------------
# §2.6 sinks (deterministic JSON assembly) and §2.7 politeness
# ---------------------------------------------------------------------------


def q_w2_main_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — main.json assembly (tools.go:296-303; Description excluded per
    the json:"-" tag at tools.go:32). JSON built with format_string so both
    engines produce byte-identical strings."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"),
                 F.lit("/main.json")).alias("path"),
        F.format_string(
            '{"Time":%d,"Memory":%d,"Title":"%s","Judge":"%s","Url":"%s","DescriptionType":"markdown"}',
            ((F.col("doc_id") % 5) + 1) * 1000,
            F.lit(256),
            F.regexp_replace(F.substring("text", 1, 16), r'"', ""),
            F.col("source"),
            F.concat(F.lit("http://"), F.col("source"), F.lit(".test/problem/"),
                     F.col("doc_id").cast("string")),
        ).alias("main_json"),
    )


SQL_W2_MAIN_JSON = """
SELECT source || '/' || CAST(doc_id AS VARCHAR) || '/main.json' AS path,
  printf('{"Time":%d,"Memory":%d,"Title":"%s","Judge":"%s","Url":"%s","DescriptionType":"markdown"}',
         (doc_id % 5 + 1) * 1000, 256,
         regexp_replace(substr(text,1,16), '"', '', 'g'), source,
         'http://' || source || '.test/problem/' || CAST(doc_id AS VARCHAR)) AS main_json
FROM documents
"""


def q_w3_write_files_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — nil-skip: failed fetches keep their listing entry but write no
    files (tools.go:312-314). Failure = deterministic doc_id slice."""
    listing = _listing(spark, sf_dir)
    fetched = listing.withColumn(
        "status", F.when(F.col("listing_pos") % 17 == 0, F.lit("error")).otherwise(F.lit("ok"))
    )
    return fetched.filter(F.col("status") == "ok").select(
        F.concat(F.col("judge"), F.lit("/"), F.col("pid"), F.lit("/description.md")).alias("path"),
        "judge", "pid",
    )


SQL_W3_WRITE_FILES_SKIP = f"""
WITH listing AS ({LISTING_SQL})
SELECT judge || '/' || pid || '/description.md' AS path, judge, pid
FROM listing WHERE listing_pos % 17 <> 0
"""


def q_c1_politeness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — politeness audit: inter-request gap per host (events/user_id as
    the host stand-in, FIXTURES.md §B): gap_ms = ts - lag(ts)."""
    # parquet timestamps load as TIMESTAMP_NTZ; analyze under a UTC pin
    # (session.utc_analyzed — the grader's TZ is restored on return) so the
    # cast to TIMESTAMP is epoch-exact and matches DuckDB's epoch_ms.  (Gap
    # DIFFERENCES cancel a constant offset, but a DST transition inside the
    # event range would not cancel.)
    from crawler_spark.session import utc_analyzed

    def build() -> DataFrame:
        e = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
        w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
        gap = (F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w)))
        out = e.withColumn("gap_ms", gap).filter(F.col("gap_ms").isNotNull())
        return out.groupBy("user_id").agg(
            F.min("gap_ms").alias("min_gap_ms"),
            F.count("*").alias("n_gaps"),
        )

    return utc_analyzed(spark, build)


SQL_C1_POLITENESS_GAPS = """
WITH g AS (
  SELECT user_id,
    epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
  FROM events)
SELECT user_id, MIN(gap_ms) AS min_gap_ms, COUNT(*) AS n_gaps
FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id
"""


def q_c2_retry_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — retry ×3 then surface error (tools.go:59-76): attempts derived
    deterministically; status = error iff all 3 attempts fail."""
    d = _t(spark, sf_dir, "documents")
    fail_rounds = (F.col("doc_id") % 5).cast("int")  # 0..4 simulated failures
    attempts = F.least(fail_rounds + 1, F.lit(3))
    status = F.when(fail_rounds >= 3, F.lit("error")).otherwise(F.lit("ok"))
    return d.select(
        "doc_id", attempts.alias("attempts"), status.alias("status")
    )


SQL_C2_RETRY_BUDGET = """
SELECT doc_id,
  CAST(LEAST(doc_id % 5 + 1, 3) AS INT) AS attempts,
  CASE WHEN doc_id % 5 >= 3 THEN 'error' ELSE 'ok' END AS status
FROM documents
"""


def q_s12_state_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 — seen-set recovery at job start (hub GetProblemlist,
    main.go:132-153 / InitPList tools.go:405-414): per-judge summary of the
    recovered checkpoint; a judge absent from the seen table is a first
    crawl (empty list, not an error — main.go:134-139)."""
    listing_judges = _listing(spark, sf_dir).select("judge").distinct()
    seen = _seen(spark, sf_dir)
    per = seen.groupBy("judge").agg(
        F.count("*").alias("n_seen"),
        F.sum((F.col("title") == "CHANGED").cast("long")).alias("n_changed"),
    )
    return (
        listing_judges.join(per, "judge", "left")
        .select(
            "judge",
            F.coalesce("n_seen", F.lit(0)).cast("long").alias("n_seen"),
            F.coalesce("n_changed", F.lit(0)).cast("long").alias("n_changed"),
        )
    )


SQL_S12_STATE_RECOVERY = f"""
WITH listing AS ({LISTING_SQL}), seen AS ({SEEN_SQL}),
per AS (
  SELECT judge, count(*) AS n_seen,
         sum(CASE WHEN title = 'CHANGED' THEN 1 ELSE 0 END) AS n_changed
  FROM seen GROUP BY judge)
SELECT j.judge, CAST(coalesce(p.n_seen, 0) AS BIGINT) AS n_seen,
       CAST(coalesce(p.n_changed, 0) AS BIGINT) AS n_changed
FROM (SELECT DISTINCT judge FROM listing) j LEFT JOIN per p ON j.judge = p.judge
"""


def q_w1_listing_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — WriteProblemList (tools.go:286-293): the per-judge listing
    snapshot as one row per judge (sorted pid:title entries — the
    problemlist.json content, order-normalized)."""
    return (
        _listing(spark, sf_dir)
        .select("judge", F.concat_ws(":", "pid", "title").alias("entry"))
        .groupBy("judge")
        .agg(
            # flattened to one string: scalar output only (array-type hash
            # normalization is comparator-dependent)
            F.concat_ws("\x01", F.sort_array(F.collect_list("entry"))).alias(
                "entries"
            ),
            F.count("*").cast("long").alias("n"),
        )
    )


SQL_W1_LISTING_SNAPSHOT = f"""
WITH listing AS ({LISTING_SQL})
SELECT judge,
       array_to_string(list_sort(list(pid || ':' || title)), chr(1)) AS entries,
       CAST(count(*) AS BIGINT) AS n
FROM listing GROUP BY judge
"""


def q_c3_failure_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — per-row failure isolation (tools.go:357-366): a failed fetch
    becomes a status row, never a job failure; every listing row survives
    with ok|error.  Deterministic simulated statuses over doc URLs;
    aggregate per judge: totals conserved, attempts ≤ 3 (C2)."""
    d = _doc_urls(spark, sf_dir).withColumn(
        "h", F.expr("instr('0123456789abcdef', substring(md5(url), 1, 1)) - 1")
    )
    rows = d.select(
        F.regexp_extract("url", r"^http://([^.]+)\.", 1).alias("judge"),
        F.when(F.col("h") < 4, F.lit("error")).otherwise(F.lit("ok")).alias(
            "status"
        ),
        (F.col("h") % 3 + 1).cast("int").alias("attempts"),
    )
    return rows.groupBy("judge").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
        F.sum((F.col("status") == "error").cast("long")).alias("n_error"),
        F.max("attempts").cast("int").alias("max_attempts"),
    )


SQL_C3_FAILURE_ISOLATION = f"""
WITH urls AS ({DOC_URLS_SQL}),
rows_ AS (
  SELECT regexp_extract(url, '^http://([^.]+)\\.', 1) AS judge,
         CASE WHEN strpos('0123456789abcdef', substr(md5(url), 1, 1)) - 1 < 4
              THEN 'error' ELSE 'ok' END AS status,
         CAST((strpos('0123456789abcdef', substr(md5(url), 1, 1)) - 1) % 3 + 1
              AS INTEGER) AS attempts
  FROM urls)
SELECT judge, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(sum(CASE WHEN status = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(max(attempts) AS INTEGER) AS max_attempts
FROM rows_ GROUP BY judge
"""


def q_c7_multi_tenant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — sequential multi-tenant run (joyoi.go:214-223 runs two judges in
    one process): all judges are partition values of ONE frontier; the
    generation query serves every tenant in a single plan, per-judge budgets
    independent."""
    gen = FR.select_generation(
        _listing(spark, sf_dir), _seen(spark, sf_dir), limit=10, seed="r1"
    )
    return gen.groupBy("judge").agg(
        F.count("*").cast("long").alias("n_selected"),
        F.sum(F.col("is_due").cast("long")).alias("n_due"),
        F.max("crawl_seq").cast("int").alias("deepest_seq"),
    )


SQL_C7_MULTI_TENANT = f"""
WITH gen AS ({SQL_FRONTIER_GENERATION})
SELECT judge, CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(is_due) AS BIGINT) AS n_due,
       CAST(max(crawl_seq) AS INTEGER) AS deepest_seq
FROM gen GROUP BY judge
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

CRAWL_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "frontier_generation": (q_frontier_generation, SQL_FRONTIER_GENERATION),
    "frontier_generation_subpart": (
        q_frontier_generation_subpart,
        SQL_FRONTIER_GENERATION,
    ),
    "j1_seen_antijoin": (q_j1_seen_antijoin, SQL_J1_SEEN_ANTIJOIN),
    "j1_due_or_changed": (q_j1_due_or_changed, SQL_J1_DUE_OR_CHANGED),
    "j3_chosen_semijoin": (q_j3_chosen_semijoin, SQL_J3_CHOSEN_SEMIJOIN),
    "a1_priority_topk": (q_a1_priority_topk, SQL_A1_PRIORITY_TOPK),
    "a3_admission_budget": (q_a3_admission_budget, SQL_A3_ADMISSION_BUDGET),
    "a4_max_over_paginator": (q_a4_max_over_paginator, SQL_A4_MAX_OVER_PAGINATOR),
    "a5_seen_refresh": (q_a5_seen_refresh, SQL_A5_SEEN_REFRESH),
    "s7_listing_expand": (q_s7_listing_expand, SQL_S7_LISTING_EXPAND),
    "s10_fixed_range_scan": (q_s10_fixed_range_scan, SQL_S10_FIXED_RANGE_SCAN),
    "p1_url_validity": (q_p1_url_validity, SQL_P1_URL_VALIDITY),
    "p4_p6_link_guards": (q_p4_p6_link_guards, SQL_P4_P6_LINK_GUARDS),
    "p5_title_projection": (q_p5_title_projection, SQL_P5_TITLE_PROJECTION),
    "t1_link_extraction": (q_t1_link_extraction, SQL_T1_LINK_EXTRACTION),
    "t2_t3_keys": (q_t2_t3_keys, SQL_T2_T3_KEYS),
    "t5_sections": (q_t5_sections, SQL_T5_SECTIONS),
    "t6_heading_rewrite": (q_t6_heading_rewrite, SQL_T6_HEADING_REWRITE),
    "t7_limit_extraction": (q_t7_limit_extraction, SQL_T7_LIMIT_EXTRACTION),
    "t8_judge_type": (q_t8_judge_type, SQL_T8_JUDGE_TYPE),
    "t9_t10_guards": (q_t9_t10_guards, SQL_T9_T10_GUARDS),
    "w2_main_json": (q_w2_main_json, SQL_W2_MAIN_JSON),
    "w3_write_files_skip": (q_w3_write_files_skip, SQL_W3_WRITE_FILES_SKIP),
    "c1_politeness_gaps": (q_c1_politeness_gaps, SQL_C1_POLITENESS_GAPS),
    "c2_retry_budget": (q_c2_retry_budget, SQL_C2_RETRY_BUDGET),
    "s12_state_recovery": (q_s12_state_recovery, SQL_S12_STATE_RECOVERY),
    "w1_listing_snapshot": (q_w1_listing_snapshot, SQL_W1_LISTING_SNAPSHOT),
    "c3_failure_isolation": (q_c3_failure_isolation, SQL_C3_FAILURE_ISOLATION),
    "c7_multi_tenant": (q_c7_multi_tenant, SQL_C7_MULTI_TENANT),
}
