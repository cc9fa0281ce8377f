"""Generation runner over the REAL judge wire formats.

The main loop (plans/run.py) drives the golden-parity synthetic web; this
runner drives the same engine stages — fetch_stage → select_generation →
adapter parse → image round → warehouse commit — through the per-judge
adapter registry (sources/adapters.py) on pages in the judges' actual wire
formats (sources/adapterweb.py).  It is the "switch from the reference"
proof: every judge family crawls end-to-end on Spark with normalized output
byte-identical to the reference's templates.

CLI:
    python -m crawler_spark.plans.run_adapters --warehouse /tmp/aw \\
        --generations 2 --limit 4
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.operators.fetch import (
    HostRoutingFetcher,
    MappingFetcher,
    SessionFetcher,
    fetch_stage,
)
from crawler_spark.operators.frontier import select_generation
from crawler_spark.operators.images import dedupe_assets, extract_image_links
from crawler_spark.sources import adapterweb as AW
from crawler_spark.sources.adapters import (
    parse_bzoj_listing,
    parse_bzoj_problem,
    parse_joyoi_listing,
    parse_joyoi_problem,
    parse_lutece_listing,
    parse_lutece_problem,
    parse_syzoj_problem,
    parse_uoj_listing,
    parse_uoj_problem,
)
from crawler_spark.sources.warehouse import ParquetWarehouse

_LISTING_PARSERS = {
    "graphql": lambda df: parse_lutece_listing(df),
    "rest": lambda df: parse_joyoi_listing(df, "Local"),
    "html": lambda df: parse_uoj_listing(df),
    # syzoj's listing page is an HTML table too — same parser family
    "json": lambda df: parse_uoj_listing(df),
    "bzoj": lambda df: parse_bzoj_listing(df),
}


def _parse_problem(judge: str, bodies: DataFrame) -> DataFrame:
    kind = AW.JUDGES[judge][0]
    host = AW.JUDGES[judge][1]
    if kind == "json":
        out = parse_syzoj_problem(bodies, home_url=f"http://{host}")
        return out.drop("ok")
    if kind == "graphql":
        return parse_lutece_problem(bodies)
    if kind == "rest":
        out = parse_joyoi_problem(bodies, src="Local", samples_col=None)
        return out.withColumn("judge_type", F.lit(None).cast("string"))
    if kind == "bzoj":
        return parse_bzoj_problem(bodies)
    out = parse_uoj_problem(bodies)
    return out


def _build_fetcher(web: AW.AdapterWeb):
    """MappingFetcher over the page universe; hosts behind a login (S11 —
    bzoj) are routed through a SessionFetcher that performs the cookie-jar
    exchange once per worker (bzoj.go:38-68)."""
    base = MappingFetcher(web.pages)
    routes = {
        AW.JUDGES[j][1]: SessionFetcher(base, login)
        for j, login in AW.LOGIN_URLS.items()
    }
    return HostRoutingFetcher(routes, base) if routes else base


def run_generation(
    spark: SparkSession,
    wh: ParquetWarehouse,
    web: AW.AdapterWeb,
    generation: int,
    limit: int = 4,
) -> dict:
    t0 = time.time()
    fetcher = _build_fetcher(web)

    # 1. listing fetch + per-kind parse
    listing_rows = [
        (j, AW.JUDGES[j][1], AW.listing_url(j)) for j in AW.JUDGES
    ]
    lf = spark.createDataFrame(
        listing_rows, "judge string, host string, url string"
    ).withColumn("generation", F.lit(generation))
    lres = fetch_stage(lf, fetcher, num_buckets=4).cache()
    if lres.filter(F.col("status") != "ok").count() > 0:
        raise RuntimeError("listing fetch failed (C4)")
    listings = []
    for judge, (kind, _host) in AW.JUDGES.items():
        bodies = lres.filter(F.col("judge") == judge).select(
            F.col("body").cast("string").alias("body")
        )
        parsed = _LISTING_PARSERS[kind](bodies).select("pid", "title")
        listings.append(parsed.withColumn("judge", F.lit(judge)))
    listing = listings[0]
    for other in listings[1:]:
        listing = listing.unionByName(other)
    from pyspark.sql import Window

    listing = listing.withColumn(
        "listing_pos",
        F.row_number().over(
            Window.partitionBy("judge").orderBy("pid")
        ).cast("int"),
    )

    # 2. selection vs seen (J1/A1/A3)
    seen = wh.read_snapshot("url_seen")
    if seen is None:
        seen = spark.createDataFrame([], "judge string, pid string, title string")
    batch = select_generation(
        listing, seen.select("judge", "pid", "title"), limit=limit,
        seed=f"ag{generation}",
    ).cache()

    # 3. problem fetch + per-kind normalize.  The frontier is built
    # relationally — a broadcast join of the selected batch against a tiny
    # (judge → host, url-template) frame, url derived with replace() — so no
    # row ever crosses the driver between selection and commit (the same
    # shape plans/run.py uses; a .collect() here would bottleneck the driver
    # as limit grows).
    tmpl = spark.createDataFrame(
        [(j, AW.JUDGES[j][1], AW.problem_url(j, "%s")) for j in AW.JUDGES],
        "judge string, host string, url_tmpl string",
    )
    problems = None
    if not batch.isEmpty():
        pf = (
            batch.select("judge", "pid")
            .join(F.broadcast(tmpl), "judge")
            .select(
                "judge", "host", "pid",
                F.expr("replace(url_tmpl, '%s', pid)").alias("url"),
            )
            .withColumn("generation", F.lit(generation))
        )
        pres = fetch_stage(pf, fetcher, num_buckets=4).cache()
        parts = []
        for judge in AW.JUDGES:
            bodies = pres.filter(
                (F.col("judge") == judge) & (F.col("status") == "ok")
            ).select("pid", F.col("body").cast("string").alias("body"))
            norm = _parse_problem(judge, bodies)
            parts.append(norm.withColumn("judge", F.lit(judge)))
        problems = parts[0]
        for other in parts[1:]:
            problems = other.unionByName(problems, allowMissingColumns=True)
        problems = problems.select(
            "judge", "pid", "url", "time_ms", "memory_mb",
            F.col("judge_type"), "description", "description_type",
        ).cache()

    # 4. image round over normalized descriptions
    n_img = 0
    if problems is not None:
        links = extract_image_links(problems)
        assets = dedupe_assets(links).withColumn(
            "host", F.regexp_extract("asset_url", r"^https?://([^/]+)", 1)
        ).withColumn("generation", F.lit(generation))
        ares = fetch_stage(
            assets.withColumnRenamed("asset_url", "url"), fetcher, num_buckets=4
        ).withColumnRenamed("url", "asset_url")
        images = ares.filter(F.col("status") == "ok").select(
            "image_id", F.col("body").alias("bytes"), "asset_url"
        )
        wh.stage_append("images", images, generation)
        n_img = images.count()

    # 5. commit (W1/W4): problems + listing + url_seen upsert
    if problems is not None:
        wh.stage_append("problems", problems, generation)
    wh.stage_append(
        "listing", listing.withColumn("generation", F.lit(generation)),
        generation,
    )
    new_seen = listing.select("judge", "pid", "title")
    merged = (
        seen.select("judge", "pid", "title")
        .join(new_seen.select("judge", "pid"), ["judge", "pid"], "left_anti")
        .unionByName(new_seen)
    )
    wh.stage_snapshot("url_seen", merged, generation)
    n_prob = problems.count() if problems is not None else 0
    metrics = {
        "generation": generation,
        "problems": n_prob,
        "images": n_img,
        "wall_s": round(time.time() - t0, 2),
    }
    wh.commit(generation, metrics)
    return metrics


def run_crawl(
    spark: SparkSession, warehouse_dir: str, web: AW.AdapterWeb,
    generations: int = 1, limit: int = 4,
) -> list[dict]:
    wh = ParquetWarehouse(warehouse_dir, spark)
    start = (wh.last_generation() + 1) if wh.last_generation() is not None else 0
    out = []
    for g in range(start, generations):
        out.append(run_generation(spark, wh, web, g, limit))
        print(f"[run_adapters] committed generation {g}: {out[-1]}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--generations", type=int, default=1)
    ap.add_argument("--limit", type=int, default=4)
    ap.add_argument("--pids", type=int, default=6)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark("run_adapters", cores=args.cores,
                      shuffle_partitions=args.cores)
    web = AW.AdapterWeb(n_pids=args.pids)
    print(f"[run_adapters] done: "
          f"{run_crawl(spark, args.warehouse, web, args.generations, args.limit)}")


if __name__ == "__main__":
    main()
