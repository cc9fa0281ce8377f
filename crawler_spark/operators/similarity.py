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


def _dot(x: str, y: str) -> str:
    """Left-to-right double fold — identical op order to cosine_expr (and to
    the DuckDB oracle), so literal-array and column-pair paths agree bitwise."""
    return (
        f"aggregate(zip_with({x}, {y}, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _array_lit(vals: list[float]) -> str:
    # repr() round-trips doubles exactly; the JVM parses the same IEEE value
    return "array(" + ",".join(f"CAST({v!r} AS DOUBLE)" for v in vals) + ")"


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, max_inline_centroids: int = 256
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine (ties → lowest centroid_id).

    **Map-side argmin — zero shuffle.**  The k centroids are collected (a
    coarse quantizer is small by construction — the same deliberate
    small-collect a broadcast does) and inlined as array literals; each
    vector row folds over them with ``greatest(struct(cos, -centroid_id)…)``
    entirely inside its scan task.  The previous formulation ranked the
    N×k broadcast cross join with a per-vec_id window — at 10^9 embeddings
    that window's exchange shuffles the expanded set (embeddings included)
    once per k-means iteration; this one shuffles nothing.

    Quantizers wider than ``max_inline_centroids`` — or whose inlined
    literal mass ``k × dims`` exceeds 32k values (high-dim quantizers would
    otherwise blow codegen/analysis expression limits) — fall back to a
    relational ``max_by`` partial aggregation (shuffles N rows, not N×k).
    At scale the assignment is a one-off build step and ``cell`` becomes
    the vector table's partition column, so a probe reads one partition.

    Zero-norm vectors (and zero-norm centroids) have no defined cosine;
    division would poison the argmin with NULL/NaN — NaN sorts ABOVE every
    real cosine in Spark, so an unguarded fold would send every zero-norm
    row to an arbitrary cell and a NULL ``cell`` into the k-means mean.
    Both paths pin their cosine to -1.0 instead, so zero-norm rows
    deterministically land in the lowest centroid_id cell.

    NOTE — eager contract: the ``centroids.collect()`` runs a Spark job at
    CALL time (like the standard k-means driver loop), so composing this
    plan executes the centroid lineage even if the result is never used;
    errors in it surface here, not at the downstream action.
    """
    rows = centroids.select("centroid_id", "c_embedding").collect()
    dims = len(rows[0].c_embedding) if rows else 0
    if rows and len(rows) <= max_inline_centroids and len(rows) * dims <= 32768:
        # Hoist the constant folds out of the per-(row × centroid) work:
        # each centroid's norm is computed ONCE here with the exact
        # left-to-right IEEE fold the SQL aggregate would run (Python float
        # IS an IEEE double; v*v then acc+prod round identically in the same
        # order, and sqrt is correctly rounded in both), and the query
        # norm is one column per row instead of one fold per centroid —
        # cutting 3 O(dims) folds per (row, centroid) to 1 + 1/k.
        def _norm(vals: list[float]) -> float:
            import math

            acc = 0.0
            for v in vals:
                acc = acc + (v * v)
            return math.sqrt(acc)

        structs = []
        for r in sorted(rows, key=lambda r: r.centroid_id):
            arr = _array_lit(list(r.c_embedding))
            cn = _norm(list(r.c_embedding))
            if cn == 0.0:
                cos = "CAST(-1.0 AS DOUBLE)"
            else:
                cos = (
                    f"CASE WHEN __qn = CAST(0.0 AS DOUBLE) "
                    f"THEN CAST(-1.0 AS DOUBLE) "
                    f"ELSE round({_dot('embedding', arr)} / "
                    f"(__qn * CAST({cn!r} AS DOUBLE)), 6) END"
                )
            # max of (cos, -centroid_id) == (cos desc, centroid_id asc) —
            # the same total order the window version used
            structs.append(
                f"struct({cos} AS c, CAST({-r.centroid_id} AS BIGINT) AS nid)"
            )
        best = f"greatest({', '.join(structs)})" if len(structs) > 1 else structs[0]
        return (
            emb.withColumn(
                "__qn", F.expr(f"sqrt({_dot('embedding', 'embedding')})")
            )
            .select(
                "vec_id",
                "embedding",
                F.expr(f"CAST(-({best}.nid) AS {_cid_type(centroids)})").alias(
                    "cell"
                ),
            )
        )
    scored = emb.crossJoin(F.broadcast(centroids))
    # guarded cosine: ANSI mode raises on division by zero, and even with it
    # off a 0/0 NaN would sort above every real cosine — pin 0-norm to -1
    # (CASE branches are lazy, so the division never runs on a 0 norm)
    cos = F.expr(
        f"CASE WHEN sqrt({_dot('embedding', 'embedding')}) = CAST(0.0 AS DOUBLE)"
        f"  OR sqrt({_dot('c_embedding', 'c_embedding')}) = CAST(0.0 AS DOUBLE)"
        f" THEN CAST(-1.0 AS DOUBLE)"
        f" ELSE round({_dot('embedding', 'c_embedding')} /"
        f" (sqrt({_dot('embedding', 'embedding')})"
        f" * sqrt({_dot('c_embedding', 'c_embedding')})), 6) END"
    )
    return (
        scored.select("vec_id", "embedding", "centroid_id", cos.alias("__c"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "max_by(centroid_id, struct(__c, -centroid_id))"
            ).alias("cell"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", "cell")
    )


def _cid_type(centroids: DataFrame) -> str:
    return centroids.schema["centroid_id"].dataType.simpleString()


def kmeans_centroids(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    seed: str = "km1",
    checkpoint: bool = False,
) -> DataFrame:
    """Train the IVF coarse quantizer: seeded k-means, fully relational and
    engine-portable (the DuckDB oracle runs the identical algorithm).

    - **init**: the k vectors with the smallest md5(seed‖vec_id) — a
      deterministic uniform sample, fetched with a distributed top-k
      (TakeOrderedAndProject), never a global sort.
    - **iterate**: assign every vector to its nearest centroid by rounded
      cosine (ties → lowest centroid id), then recompute each cell's mean
      per dimension with an order-independent DECIMAL sum (float partial-agg
      order would make the centroids nondeterministic), rounded to 6
      decimals so both engines carry bit-identical centroid values into the
      next iteration.  Emptied cells drop out in both engines alike.

    Everything is joins + aggregations over (cell, pos) rows — no driver
    materialization; at real scale pass ``checkpoint=True`` to
    localCheckpoint between iterations and keep the plan shallow.

    Returns (centroid_id, c_embedding:array<double>).
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("vec_id").cast("string")))
    top = (
        emb.select("vec_id", "embedding", h.alias("__h"))
        .orderBy("__h", "vec_id")
        .limit(k)
    )
    # the k seed rows are collected and re-created with enumerated ids:
    # the training loop is eager anyway (ivf_assign collects centroids per
    # iteration), the distributed fetch is a TakeOrderedAndProject (never a
    # global sort), and this avoids a no-partition window (a full-data
    # single-partition shuffle at any real k, plus the WindowExec warning).
    seed_rows = sorted(top.collect(), key=lambda r: (r["__h"], r["vec_id"]))
    cent = emb.sparkSession.createDataFrame(
        [(i, [float(v) for v in r["embedding"]]) for i, r in enumerate(seed_rows)],
        "centroid_id int, c_embedding array<double>",
    )
    for _ in range(iters):
        assigned = ivf_assign(emb, cent)
        means = (
            assigned.select(
                "cell", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("decimal(24,12)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("m")
            )
        )
        cent = means.groupBy("cell").agg(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("c_embedding")
        ).select(F.col("cell").alias("centroid_id"), "c_embedding")
        if checkpoint:
            cent = cent.localCheckpoint()
    return cent


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN: probe the query's ``nprobe`` nearest centroid cells.

    Corpus and queries are assigned with the SAME quantizer; the candidate
    join is on ``cell``, so the scan per query is nprobe·|N|/|cells| — on a
    cell-partitioned table it is partition-pruned I/O, not just less
    compute.  Exact cosine re-rank inside the probed cells; nprobe > 1
    buys recall at linear candidate cost (the standard IVF knob).
    """
    e = ivf_assign(emb, centroids)
    qv = queries.select(
        F.col("query_id").alias("vec_id"),
        F.col("q_embedding").alias("embedding"),
    )
    scored = qv.crossJoin(F.broadcast(centroids))
    cos = F.round(cosine_expr("embedding", "c_embedding"), 6)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("__c").desc(), F.col("centroid_id").asc()
    )
    q = (
        scored.select("vec_id", "embedding", "centroid_id", cos.alias("__c"))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
            F.col("centroid_id").alias("cell"),
        )
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
