"""Sparse retrieval over the document corpus: integer-exact Okapi BM25.

A 100-TB training-data pipeline ships retrieval for three jobs: quality
curation by similarity-to-reference (retrieve the corpus neighbourhood of a
trusted seed set), retrieval-based decontamination (benchmark queries as
probes), and dedup triage (near-miss inspection).  The operator here is the
classic inverted-index ranking function, Robertson et al.'s Okapi BM25
(TREC-3, 1994; parameters k1=1.2, b=0.75 as in Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond").

Cross-engine exactness: BM25 is float-ridden in textbook form, so the score
is restated in integer arithmetic with k1 = 6/5 and b = 3/4:

    tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

with avgdl carried as the scaled integer A_e4 = (10^4 * total_tokens) div
n_docs, multiply numerator and denominator by 10*A_e4:

    tf_part == 22*tf*A_e4 / (10*tf*A_e4 + 3*A_e4 + 9*dl*10^4)

The only float is the idf, computed ONCE per distinct query term from
integer (N, df) — ln((N - df + 0.5)/(df + 0.5) + 1) is the same IEEE double
in every engine (integer+0.5 is exact, one division, one ln) — and rounded
to a scaled BIGINT idf_e4 (the ln-rounded-once precedent of the tfidf /
unigram-LM operators).  Per (query, doc, term):

    w_e4 = (idf_e4 * 22 * tf * A_e4) div (10*tf*A_e4 + 3*A_e4 + 9*dl*10^4)

and the document score is the exact BIGINT sum of w_e4 — identical in any
engine with 64-bit integers.

Scale shape: the corpus is touched by ONE pass that explodes tokens and
immediately inner-broadcast-joins the (tiny) query-term table, so only
postings for queried terms ever reach an aggregate — the inverted-index
probe, never a full index build.  df/N/S are bounded aggregates (distinct
queried terms; one global row).  The final per-query top-k uses a rank
window partitioned by query_id — the same broadcast-query idiom as the ANN
rankers; with millions of concurrent queries you would swap in a
per-partition partial top-k merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_topk(
    docs: DataFrame,
    query_terms: dict[int, list[str]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query under integer-exact BM25.

    ``query_terms`` maps query_id -> bag of lowercase terms (duplicate
    terms in a query are deliberately collapsed — standard BM25 treats the
    query as a set).  Returns (query_id, rank, doc_id, n_terms_matched,
    score_e4) with rank 1..k ordered by (score_e4 DESC, doc_id ASC) — a
    total, engine-independent key.  Terms absent from the corpus simply
    contribute no postings (df = 0 never reaches the idf).
    """
    # docs.sparkSession, not getActiveSession(): the latter is thread-local
    # and returns None from a thread that never touched the session (e.g. a
    # parallel query runner), failing far from the cause
    spark = docs.sparkSession
    qrows = sorted(
        {(qid, t) for qid, terms in query_terms.items() for t in terms}
    )
    qdf = spark.createDataFrame(qrows, "query_id long, term string")

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("dl"),
    )
    # one corpus pass: explode -> broadcast semi-filter to queried terms
    # only, so the aggregate keys on (doc, matched term), never the vocab
    postings = (
        t.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .join(F.broadcast(qdf.select("term").distinct()), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    stats = t.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )  # one row
    dfreq = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    # idf_e4: the single rounded float, once per distinct queried term
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * 10000
        )
        .cast("long")
        .alias("idf_e4"),
    )
    scored = (
        postings.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("a_e4", F.expr("CAST(10000 * sum_dl div n_docs AS BIGINT)"))
        .withColumn(
            "w_e4",
            F.expr(
                "CAST(idf_e4 * 22 * tf * a_e4 div "
                "(10 * tf * a_e4 + 3 * a_e4 + 9 * dl * 10000) AS BIGINT)"
            ),
        )
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum("w_e4").cast("long").alias("score_e4"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e4").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "n_terms_matched", "score_e4")
    )
