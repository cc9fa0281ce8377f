"""Approximate-nearest-neighbor search over an embedding column.

Not present in the reference (it has no vector data); required by the
training-data-pipeline surface.  Two strategies:

- **brute-force top-k** — broadcast the (small) query set, JVM-side
  `zip_with`/`aggregate` cosine against every corpus vector, per-query
  window top-k.  Exact; the baseline and the verifier for the ANN path.
  Cost: |Q|·|N| dot products, one shuffle for the window.  At 100 TB this is
  the re-rank stage, not the full scan.
- **sign-LSH bucketed top-k** — deterministic random-hyperplane-style LSH
  using axis sign bits (bit_d = embedding[d] ≥ 0 for a fixed dim subset):
  corpus is bucketed once (a narrow int column, partition-prunable), a query
  probes only its own bucket.  Recall < 1 by design; the candidate set per
  query drops from N to N/2^bits.  The scale path: bucket is a partition
  key of the vector table, so a probe is a partition-pruned scan.

All column-expression math (no UDFs) so the DuckDB oracle mirrors exactly:
same dot-product fold order, same rounding, same (score, id) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import cosine_expr


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries``: (query_id, q_embedding).  Broadcast-joined against the
    corpus (no shuffle of the big side); ranking window shuffles only
    (query_id, vec_id, cosine) — the embedding columns are pruned before the
    exchange.  Ties broken by vec_id ascending on the ROUNDED score so the
    ordering is engine-independent.
    """
    scored = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(cosine_expr("embedding", "q_embedding"), 4)
    scored = scored.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def sign_lsh_bucket(col: str, dims: list[int]) -> F.Column:
    """Bucket id = Σ_i [embedding[dims[i]] ≥ 0] · 2^i  (axis-sign LSH).

    Deterministic, engine-portable (float32 ≥ 0 compare is exact), and cheap
    enough to be a generated partition column on the vector table.
    """
    acc = " + ".join(
        f"(CASE WHEN {col}[{d}] >= 0 THEN 1 ELSE 0 END) * {1 << i}"
        for i, d in enumerate(dims)
    )
    return F.expr(acc)


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine (ties → lowest centroid_id).

    ``centroids``: (centroid_id, c_embedding) — small, broadcast.  At scale
    the assignment is a one-off build step and ``cell`` becomes the vector
    table's partition column, so a probe reads one partition.
    """
    scored = emb.crossJoin(F.broadcast(centroids))
    cos = F.round(cosine_expr("embedding", "c_embedding"), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__c").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.select("vec_id", "embedding", "centroid_id", cos.alias("__c"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("cell"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
) -> DataFrame:
    """IVF ANN: probe only the query's nearest centroid cell (nprobe=1).

    Corpus and queries are assigned with the SAME quantizer; the candidate
    join is on ``cell``, so the scan per query is |N|/|cells| — on a
    cell-partitioned table it is partition-pruned I/O, not just less
    compute.  Exact cosine re-rank inside the cell.
    """
    e = ivf_assign(emb, centroids)
    q = ivf_assign(
        queries.select(
            F.col("query_id").alias("vec_id"),
            F.col("q_embedding").alias("embedding"),
        ),
        centroids,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        "cell",
    )
    cand = e.join(F.broadcast(q), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(cosine_expr("embedding", "q_embedding"), 4)
    scored = cand.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: list[int] | None = None,
) -> DataFrame:
    """ANN top-k: probe only the query's sign-LSH bucket.

    The bucket-equality join replaces the cross join — with B buckets the
    scanned candidate set is ~N/B per query.  On a partitioned vector table
    the bucket predicate partition-prunes the scan entirely.
    """
    dims = dims or [0, 8, 16, 24, 32, 40, 48, 56]
    e = emb.withColumn("bucket", sign_lsh_bucket("embedding", dims))
    q = queries.withColumn("bucket", sign_lsh_bucket("q_embedding", dims))
    cand = e.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(cosine_expr("embedding", "q_embedding"), 4)
    scored = cand.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
