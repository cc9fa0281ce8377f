"""Link-graph analytics for crawl prioritization.

The reference crawls a link graph breadth-first with per-judge priorities
(`/root/reference/plugin/public/tools.go` selection order); production
crawlers weight the frontier by link importance — OPIC / PageRank is the
classic.  This module provides an INTEGER-ARITHMETIC PageRank whose every
step is exact in any engine (scaled fixed-point, truncating `div`), so the
DuckDB oracle replays the iterations bit-for-bit — the same portability
rule the k-means / minhash oracles follow.

Scale shape per iteration: one groupBy(dst) hash aggregate with map-side
partials over (dst, contrib) longs — the canonical distributed PageRank;
edges are never materialized wider than two ids and a long.  Fixed
out-degree (the synthetic graph below) keeps the contribution an exact
`div`; a variable-degree graph divides by its own outdeg column the same
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # fixed-point: rank 1.0 == 10^12


def synthetic_edges(nodes: DataFrame, out_degree: int = 3) -> DataFrame:
    """Deterministic link graph over a node table: node ranks 0..N-1 (by
    id order, identical in any engine), each node links to
    (31·rank + 17·j) mod N for j = 1..out_degree.  Fixed out-degree by
    construction; self-loops possible and harmless."""
    from pyspark.sql import Window

    n = nodes.count()
    ranked = nodes.withColumn(
        "src_rank",
        F.row_number().over(Window.orderBy("node_id")) - 1,
    )
    dsts = [
        ((F.col("src_rank") * 31 + 17 * j) % n).alias(f"__d{j}")
        for j in range(1, out_degree + 1)
    ]
    wide = ranked.select("src_rank", *dsts)
    return wide.select(
        "src_rank",
        F.explode(
            F.array(*[F.col(f"__d{j}") for j in range(1, out_degree + 1)])
        ).alias("dst_rank"),
    )


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    out_degree: int = 3,
) -> DataFrame:
    """Fixed-point PageRank: r₀ = SCALE div N;
    rᵢ₊₁(v) = ((100−d)·(SCALE div N)) div 100 + (d · Σ_{u→v} rᵢ(u) div deg) div 100.

    Every operation is integer (`div` truncates identically in Spark,
    DuckDB, and Python), so ``iters`` unrolled iterations replay exactly in
    the oracle.  Each iteration is ONE hash aggregate over (dst, contrib)
    longs; the rank frame stays (rank, long).  Returns (node_rank,
    rank_e12).

    Lineage grows one join+agg layer per iteration — fine for the few
    iterations frontier prioritization needs; deep runs should
    ``localCheckpoint`` the rank frame every ~10 rounds exactly as
    dedup.connected_components does.
    """
    n = nodes.count()
    base = SCALE // n
    teleport = ((100 - damping_pct) * base) // 100
    ranks = (
        edges.select("src_rank")
        .unionByName(edges.select(F.col("dst_rank").alias("src_rank")))
        .distinct()
        .select(F.col("src_rank").alias("node_rank"))
        .withColumn("rank_e12", F.lit(base).cast("long"))
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks, edges["src_rank"] == ranks["node_rank"], "inner"
            )
            .select(
                F.col("dst_rank").alias("node_rank"),
                F.expr(f"rank_e12 div {out_degree}").alias("__c"),
            )
            .groupBy("node_rank")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            ranks.select("node_rank")
            .join(contrib, "node_rank", "left")
            .select(
                "node_rank",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{damping_pct} * coalesce(__in, 0L) div 100"
                    )
                ).cast("long").alias("rank_e12"),
            )
        )
    return ranks
