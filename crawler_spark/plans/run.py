"""The generation loop — SURVEY §3.1 lifecycle, end to end.

One generation = the reference's single `Update()` run
(/root/reference/plugin/syzoj/main.go:73-141), for all judges at once:

  read url_seen + host_state → robots (C5) → listing expansion (S7/A4/P2)
  → parse listing → select batch (J1/A1/A3, §2.9 order) → fetch problems
  (C1-C3) → parse (T5-T8) → extract/fetch/decode image assets (T1/S14)
  → rewrite links → ONE atomic commit (W1-W5): problems + images +
  fetch_log + lineage appends, url_seen + host_state snapshots.

Resume: the next run continues from max committed generation — the
`GetProblemlist` recovery analog (main.go:132-153). Kill the process at any
point and re-run: uncommitted staging is invisible, so the final state
equals the uninterrupted run (tested in tests/test_crawl_loop.py).

CLI:
  python -m crawler_spark.plans.run --warehouse /tmp/wh --generations 2 \\
      --judges 4 --pids 40 --limit 20 --cores 8
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions.urls import canonicalize, url_hash64
from crawler_spark.operators.fetch import (
    SyntheticFetcher,
    fetch_log_from,
    fetch_stage,
    lineage_from,
)
from crawler_spark.operators.frontier import select_generation
from crawler_spark.operators.images import (
    decode_assets,
    dedupe_assets,
    extract_image_links,
    rewrite_descriptions,
)
from crawler_spark.operators.parse import extract_max_page, parse_listing, parse_problem
from crawler_spark.operators.politeness import (
    apply_robots,
    next_host_state,
    parse_robots,
)
from crawler_spark.sources.synthweb import SynthWeb
from crawler_spark.sources.warehouse import ParquetWarehouse


class ListingPhaseError(RuntimeError):
    """C4 — any listing failure aborts the generation (job retry)."""


SEEN_DDL = (
    "judge string, pid string, canonical_url string, url_hash bigint, "
    "title string, last_generation int"
)


def _empty_seen(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], SEEN_DDL)


def run_generation(
    spark: SparkSession,
    wh: ParquetWarehouse,
    web: SynthWeb,
    generation: int,
    limit: int = 20,
    num_buckets: int = 16,
    run_id: str = "run0",
    base_ts: float = 1_700_000_000.0,
    seen_buckets: int = 0,
) -> dict:
    fetcher = SyntheticFetcher(web)
    t0 = time.time()
    judges = sorted(web.judges)
    judge_rows = [(j, web.host(j), web.judges[j].min_delay_ms) for j in judges]
    judges_df = spark.createDataFrame(
        judge_rows, "judge string, host string, min_delay_ms int"
    )
    gen_base = base_ts + generation * 10_000  # simulated clock epoch per gen

    # -- 0. host_state: prior snapshot, or robots fetch on first run (C5)
    host_state = wh.read_snapshot("host_state")
    if host_state is None:
        robots_frontier = judges_df.select(
            F.concat(F.lit("http://"), "host", F.lit("/robots.txt")).alias("url"),
            "host",
            "judge",
            F.lit(generation).alias("generation"),
            "min_delay_ms",
        )
        robots_res = fetch_stage(robots_frontier, fetcher, num_buckets, gen_base).cache()
        rules = parse_robots(robots_res)
        host_state = (
            judges_df.join(rules, on="host", how="left")
            .select(
                "host",
                "min_delay_ms",
                F.coalesce("robots_disallow", F.array().cast("array<string>")).alias(
                    "robots_disallow"
                ),
                F.coalesce("crawl_delay_ms", F.lit(0)).alias("crawl_delay_ms"),
                F.lit(None).cast("double").alias("next_allowed_ts"),
            )
        )
        # robots fetches consume politeness budget too — advance host clocks
        host_state = next_host_state(
            robots_res.select("host", "fetched_at", "min_delay_ms"), host_state
        )
    # host_state is tiny (one row per host); localCheckpoint truncates the
    # growing plan so later stages re-broadcast a shallow relation
    host_state = host_state.localCheckpoint(eager=True)

    # -- 1. listing phase: page 1 → maxPage (A4/P2) → expand (S7) → parse
    first_frontier = apply_robots(
        judges_df.select(
            F.lit(None).cast("string").alias("kind"),
            F.concat(F.lit("http://"), "host", F.lit("/problems?page=1")).alias("url"),
            "host",
            "judge",
            F.lit(generation).alias("generation"),
        ),
        host_state,
    )
    first_res = fetch_stage(first_frontier, fetcher, num_buckets, gen_base).cache()
    # per-host clocks carry through EVERY stage of the generation (C1): the
    # reference's single-threaded plugin interleaves listing/problem/image
    # requests on one clock — next_host_state reproduces that across stages.
    host_state = next_host_state(
        first_res.select("host", "fetched_at", "min_delay_ms"), host_state
    ).localCheckpoint(eager=True)
    if first_res.filter(F.col("status") != "ok").count() > 0:
        raise ListingPhaseError("listing page 1 fetch failed (C4)")
    maxp = extract_max_page(first_res)
    if maxp.filter(F.col("max_page").isNull()).count() > 0:
        raise ListingPhaseError("maxPage sanity bound violated (P2/C4)")
    pages = maxp.select(
        "judge",
        "host",
        F.explode(F.sequence(F.lit(1), F.col("max_page"))).alias("page"),
    )
    listing_frontier = apply_robots(
        pages.select(
            F.format_string("http://%s/problems?page=%d", "host", "page").alias("url"),
            "host",
            "judge",
            F.lit(generation).alias("generation"),
        ),
        host_state,
    )
    listing_res = fetch_stage(listing_frontier, fetcher, num_buckets, gen_base).cache()
    if listing_res.filter(F.col("status") != "ok").count() > 0:
        raise ListingPhaseError("listing page fetch failed (C4)")
    listing = parse_listing(listing_res, page_size=10).cache()
    host_state = next_host_state(
        listing_res.select("host", "fetched_at", "min_delay_ms"), host_state
    ).localCheckpoint(eager=True)

    # -- 2. selection (J1 + A1 + A3, §2.9 normative order)
    # seen_buckets > 0 → the co-located store: the snapshot is written
    # bucketBy(seen_buckets, judge, pid), so this read carries the hash
    # distribution into the selection join (tests/test_bucketed.py pins the
    # zero-Exchange property; at 10^10 keys that exchange IS the job)
    if seen_buckets:
        from crawler_spark.sources.warehouse import BucketSpecError

        try:
            seen = wh.read_snapshot_bucketed(
                "url_seen", SEEN_DDL, ["judge", "pid"], seen_buckets
            ) or _empty_seen(spark)
        except BucketSpecError:
            # pre---seen-buckets history (or a different layout): fall back
            # to the plain read — correct, just not co-located; this
            # generation's write below re-buckets the snapshot
            seen = wh.read_snapshot("url_seen") or _empty_seen(spark)
    else:
        seen = wh.read_snapshot("url_seen") or _empty_seen(spark)
    batch = select_generation(
        listing, seen.select("judge", "pid", "title"), limit=limit,
        seed=f"g{generation}",
    )

    # -- 3. problem fetch + parse
    prob_frontier = batch.select(
        F.format_string("http://%s/problem/%s", "host", "pid").alias("url"),
        "host",
        "judge",
        "pid",
        "title",
        "listing_pos",
        "crawl_seq",
        F.lit(generation).alias("generation"),
    )
    prob_frontier = apply_robots(prob_frontier, host_state)
    prob_res = fetch_stage(prob_frontier, fetcher, num_buckets, gen_base).cache()
    problems = parse_problem(prob_res).cache()
    host_state = next_host_state(
        prob_res.select("host", "fetched_at", "min_delay_ms"), host_state
    ).localCheckpoint(eager=True)

    # -- 4. asset round (T1/S14): extract → dedupe → fetch → decode → rewrite
    links = extract_image_links(problems).cache()
    assets = dedupe_assets(links).withColumn(
        "host",
        F.regexp_extract("asset_url", r"^https?://([^/]+)", 1),
    ).withColumn("generation", F.lit(generation))
    assets = apply_robots(
        assets.withColumnRenamed("asset_url", "url"), host_state
    ).withColumnRenamed("url", "asset_url")
    asset_res = fetch_stage(
        assets.withColumnRenamed("asset_url", "url"), fetcher, num_buckets, gen_base
    ).withColumnRenamed("url", "asset_url").cache()
    images = decode_assets(asset_res, web)
    link_status = links.join(
        asset_res.select("asset_url", "status"), on="asset_url", how="left"
    )
    rewritten = rewrite_descriptions(problems, link_status)
    problems_final = (
        problems.drop("description")
        .join(rewritten.withColumnRenamed("description", "description_rw"),
              on=["judge", "pid"], how="left")
        .select(
            "judge", "pid", "title",
            F.col("url").alias("url"),
            "time_ms", "memory_mb", "judge_type",
            F.col("description_rw").alias("description"),
            "description_type", "status",
            # crawl-order parity columns (§2.9 normative ordering)
            "crawl_seq", "generation",
        )
    )

    # -- 5. atomic commit (W1-W5): everything staged, then one manifest
    all_fetches = None
    for res in (first_res, listing_res, prob_res,
                asset_res.withColumnRenamed("asset_url", "url")):
        proj = fetch_log_from(res, generation)
        all_fetches = proj if all_fetches is None else all_fetches.unionByName(proj)
    wh.stage_append("problems", problems_final, generation)
    wh.stage_append("images", images, generation)
    wh.stage_append("fetch_log", all_fetches, generation)
    wh.stage_append(
        "lineage",
        lineage_from(prob_res, run_id, generation),
        generation,
    )
    wh.stage_append(
        "listing",
        listing.withColumn("generation", F.lit(generation)),
        generation,
    )
    # A5 — seen-set refresh from the NEW listing regardless of fetch success
    # (syzoj/main.go:127-130), as a keyed upsert over the prior snapshot.
    new_seen = listing.select(
        "judge",
        "pid",
        canonicalize(F.format_string("http://%s/problem/%s", "host", "pid")).alias(
            "canonical_url"
        ),
        url_hash64(F.format_string("http://%s/problem/%s", "host", "pid")).alias(
            "url_hash"
        ),
        "title",
        F.lit(generation).alias("last_generation"),
    )
    merged_seen = (
        seen.join(new_seen.select("judge", "pid"), ["judge", "pid"], "left_anti")
        .unionByName(new_seen)
    )
    if seen_buckets:
        wh.stage_snapshot_bucketed(
            "url_seen", merged_seen, generation, ["judge", "pid"],
            seen_buckets,
        )
    else:
        wh.stage_snapshot("url_seen", merged_seen, generation)
    # host clocks already include robots/listing/problem stages; add assets
    wh.stage_snapshot(
        "host_state",
        next_host_state(
            asset_res.select("host", "fetched_at", "min_delay_ms"), host_state
        ),
        generation,
    )

    n_prob = problems_final.count()
    n_img = images.count()
    n_fetch = all_fetches.count()
    metrics = {
        "generation": generation,
        "problems": n_prob,
        "images": n_img,
        "fetches": n_fetch,
        "wall_s": round(time.time() - t0, 2),
        "urls_per_s": round(n_fetch / max(time.time() - t0, 1e-9), 1),
    }
    wh.commit(generation, metrics)
    for df in (first_res, listing_res, prob_res, asset_res, listing, links,
               problems):
        df.unpersist()
    return metrics


# Clustered-compaction keys per append table — chosen for the table's hot
# read path, so the one range shuffle per rewrite buys parquet-footer file
# skipping on every later scan: problems/listing are read per (judge, pid)
# (W2 main-json reads, recrawl diffs), fetch_log per host + time range
# (politeness audits).  images/lineage have no selective read path → binpack.
COMPACT_SORT_KEYS: dict[str, list[str] | None] = {
    "problems": ["judge", "pid"],
    "listing": ["judge", "pid"],
    "fetch_log": ["host", "fetched_at"],
    "images": None,
    "lineage": None,
}


def maintain_warehouse(wh: ParquetWarehouse, expire: bool = False) -> dict:
    """Periodic storage maintenance (the Iceberg rewrite_data_files +
    expire_snapshots pass a long-lived crawl store needs): compact every
    committed append table's history into target-size files, clustered per
    COMPACT_SORT_KEYS.  ``expire`` additionally reclaims the superseded
    per-generation dirs — trading time travel before the compaction bound
    for storage, exactly like snapshot expiry."""
    stats = {}
    for table, keys in COMPACT_SORT_KEYS.items():
        if not (wh.root / table).exists():
            continue
        # a crashed run can leave the table dir with only staged
        # (uncommitted) data — maintenance must skip it, not abort the
        # crawl loop; compact_appends signals that with ValueError
        try:
            m = wh.compact_appends(table, sort_by=keys)
        except ValueError as exc:
            stats[table] = {"skipped": str(exc)}
            continue
        if expire:
            m["expired_dirs"] = wh.expire_compacted(table)
        stats[table] = {
            "files": f"{m['files_before']}->{m['files_after']}",
            "through": m["through"],
        }
    return stats


def run_crawl(
    spark: SparkSession,
    warehouse_dir: str,
    web: SynthWeb,
    generations: int = 1,
    limit: int = 20,
    num_buckets: int = 16,
    run_id: str = "run0",
    seen_buckets: int = 0,
    compact_every: int = 0,
    expire: bool = False,
    seen_churn: bool = False,
) -> list[dict]:
    """Driver loop with resume: continues after the last committed
    generation (idempotent under kill/restart).  ``compact_every`` > 0 runs
    :func:`maintain_warehouse` after every Nth committed generation — the
    small-file problem is per-generation directories × 10^4 generations, so
    a real deployment compacts as it crawls, not as an afterthought.
    ``seen_churn`` adds a per-generation CDC report over the url_seen
    snapshot (warehouse.snapshot_diff) to the returned metrics — the
    added/removed/changed key counts an operator watches to spot listing
    regressions (a sudden mass-removal means an adapter broke, not that
    the judge deleted its archive)."""
    wh = ParquetWarehouse(warehouse_dir, spark)
    start = (wh.last_generation() + 1) if wh.last_generation() is not None else 0
    out = []
    for g in range(start, generations):
        out.append(
            run_generation(
                spark, wh, web, g, limit, num_buckets, run_id,
                seen_buckets=seen_buckets,
            )
        )
        if seen_churn and g > 0:
            churn = (
                wh.snapshot_diff(
                    "url_seen", ["judge", "pid"], g - 1, g,
                    ignore_cols=("last_generation",),
                )
                .groupBy("change")
                .count()
                .collect()
            )
            out[-1]["seen_churn"] = {r["change"]: r["count"] for r in churn}
        print(f"[crawler_spark] committed generation {g}: {out[-1]}")
        if compact_every and (g + 1) % compact_every == 0:
            stats = maintain_warehouse(wh, expire=expire)
            print(f"[crawler_spark] compacted after generation {g}: {stats}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description="crawler_spark generation loop")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--generations", type=int, default=1)
    ap.add_argument("--judges", type=int, default=4)
    ap.add_argument("--pids", type=int, default=40)
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--seed", default="synthweb-42")
    ap.add_argument(
        "--seen-buckets", type=int, default=0,
        help="bucketBy(N, judge, pid) the url_seen snapshots (co-located "
             "selection join; 0 = plain parquet)",
    )
    ap.add_argument(
        "--compact-every", type=int, default=0,
        help="compact append tables (sort-clustered per hot read path) "
             "after every N committed generations (0 = never)",
    )
    ap.add_argument(
        "--seen-churn", action="store_true",
        help="report per-generation added/removed/changed url_seen keys "
             "(CDC diff of consecutive snapshots) in the metrics",
    )
    ap.add_argument(
        "--expire-compacted", action="store_true",
        help="after each compaction, reclaim the superseded per-generation "
             "dirs (trades pre-bound time travel for storage)",
    )
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark("crawler_spark.run", cores=args.cores,
                      shuffle_partitions=args.cores)
    web = SynthWeb.default(n_judges=args.judges, n_pids=args.pids)
    web.seed = args.seed
    metrics = run_crawl(
        spark, args.warehouse, web, args.generations, args.limit, args.buckets,
        seen_buckets=args.seen_buckets,
        compact_every=args.compact_every,
        expire=args.expire_compacted,
        seen_churn=args.seen_churn,
    )
    print(f"[crawler_spark] done: {metrics}")


if __name__ == "__main__":
    main()
