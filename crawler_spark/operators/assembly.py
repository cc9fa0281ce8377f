"""Dataset-assembly operators: deterministic holdout splits, a hashed
linear quality model, and temperature-based source mixing.

These are the last-mile steps a training-data pipeline runs after
dedup/curation (reference scope: the crawler feeds a training corpus;
these ops have no reference counterpart and are pure pipeline additions):

* ``assign_split`` — contamination-safe train/valid/test assignment.
  The split is a pure function of (salt, key): the same document lands in
  the same split across reruns, backfills, and corpus growth, which is the
  property that keeps eval sets clean when the corpus is rebuilt.  It is a
  map-side expression — no shuffle, no state, trivially scales.

* ``hashed_linear_score`` — a fastText-shaped quality classifier: hashed
  bag-of-words → signed integer weights → per-doc sum.  Real pipelines
  load trained weights; here the weight of a token is derived from the
  token's own 60-bit md5 prefix so the whole model is reproducible in any
  engine with integer arithmetic only (exact cross-engine parity — no
  float ever enters the score).  The shape is the scalable one: explode →
  map-side partial sum → one narrow shuffle of (doc_id, partial) longs.

* ``source_mix_weights`` — Pile/LLaMA-style temperature sampling over
  sources: weight_α(s) ∝ count(s)^α with α=½, computed as
  floor(sqrt(count)) so the mix table is integer-exact (IEEE sqrt is
  correctly rounded in every engine).  Output is one row per source —
  tiny — and the quota allocation is a broadcast-friendly dimension for
  the actual sampling join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit md5 prefix as BIGINT — positive in a signed 64-bit lane in every
# engine.  DuckDB mirror: ('0x' || substr(md5(x),1,15))::BIGINT (bit-equal,
# verified three-way in tests/test_properties.py for the minhash twin).
def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def split_bucket(key: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt ':' key)."""
    h = _h60(F.concat(F.lit(salt + ":"), key.cast("string")))
    return (h % F.lit(buckets)).cast("int")


def assign_split(
    df: DataFrame,
    key_col: str,
    salt: str = "split1",
    valid_pct: int = 5,
    test_pct: int = 5,
    buckets: int = 100,
) -> DataFrame:
    """Add ``bucket`` and ``split`` ('train'|'valid'|'test') columns.

    bucket < test_pct → test; < test_pct+valid_pct → valid; else train.
    Purely map-side; the assignment never changes for a given (salt, key),
    so growing the corpus never moves an old document across splits.
    """
    b = split_bucket(F.col(key_col), salt, buckets)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < test_pct, F.lit("test"))
        .when(F.col("bucket") < test_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("train")),
    )


# Hashed-linear-model constants: weight(token) = h60(token) % MODULUS - BIAS
# gives signed pseudo-weights in [-998, 998] with zero mean over uniform
# hashes; a doc "keeps" when its summed weight is positive.  MODULUS is
# prime so low bits of the hash don't bias the sign.
MODEL_MODULUS = 1997
MODEL_BIAS = 998


def token_weight(token: Column) -> Column:
    """Signed integer weight of a token under the hashed linear model."""
    return (_h60(token) % F.lit(MODEL_MODULUS)) - F.lit(MODEL_BIAS)


def hashed_linear_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality score: Σ token_weight over whitespace tokens.

    Explode + hash-aggregate: the md5 per token is whole-stage-codegen'd,
    the sum combines map-side, and the only shuffle moves (doc_id,
    partial_sum) longs — at 10^10 docs this is one narrow exchange, not a
    text shuffle.  Returns (id, n_tokens BIGINT, score BIGINT,
    keep BOOLEAN).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(token_weight(F.col("token"))).cast("long").alias("score"),
    ).withColumn("keep", F.col("score") > 0)


def source_mix_weights(
    docs: DataFrame,
    source_col: str = "source",
    budget: int = 1000,
) -> DataFrame:
    """Temperature-½ source mixing: per source s,
    w(s) = floor(sqrt(n_docs(s))); weight_e6 = w·10⁶ div Σw;
    quota = budget·w div Σw (truncating integer division — the fractional
    remainders are deliberately dropped; a largest-remainder top-up is a
    driver-side 20-row fix-up, not a distributed concern).

    One groupBy on the bounded-cardinality source key, then a scalar total
    joined back by crossJoin — the totals frame is one row, so Catalyst
    broadcasts it.  floor(sqrt(n)) is integer-exact cross-engine because
    IEEE-754 sqrt is correctly rounded everywhere.
    """
    per = docs.groupBy(source_col).agg(F.count("*").cast("long").alias("n_docs"))
    per = per.withColumn(
        "sqrt_w",
        F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long"),
    )
    total = per.agg(F.sum("sqrt_w").alias("total_w"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            "sqrt_w",
            F.expr("CAST(sqrt_w * 1000000 div total_w AS BIGINT)").alias(
                "weight_e6"
            ),
            F.expr(f"CAST({budget} * sqrt_w div total_w AS BIGINT)").alias(
                "quota_docs"
            ),
        )
    )


def unimax_allocation(
    docs: DataFrame,
    lang_col: str = "lang",
    budget: int = 800,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): spread a total document ``budget`` as uniformly as
    possible across languages, capping every language at
    ``max_epochs`` x its corpus size — the epoch-bounded waterfilling that
    replaces temperature sampling (cf. source_mix_weights) when repeating
    low-resource data too often hurts.

    Closed-form waterfilling instead of the paper's greedy loop: with
    languages sorted by cap ascending, language i is budget-constrained
    ("takes its full cap") iff cap_i * (L - i + 1) < budget - capsum_{i-1}
    — the standard exchange argument makes the constrained set a prefix of
    the sort order, so one pass of prefix sums decides every language.
    All comparisons are cross-multiplied integers and the leftover share
    uses integer ``div``, so allocations are engine-exact.

    Shape at 100 TB: one groupBy on the bounded language key (the only
    corpus-wide pass, map-side combinable), then self-join + scalar
    cross-joins over the L-row language table — L is dozens, never data
    scale, so every post-aggregate step is broadcast-sized.  Returns
    (lang, n_docs, cap_docs, alloc_docs, epochs_e4) where epochs_e4 is the
    implied repeat factor x10^4.
    """
    if budget <= 0 or max_epochs <= 0:
        raise ValueError("need budget > 0 and max_epochs > 0")
    per = docs.groupBy(lang_col).agg(F.count("*").cast("long").alias("n_docs"))
    # persist the L-row language table: it feeds the self-join (twice), the
    # scalar total and the constrained rollup — without this each consumer
    # re-runs the full corpus groupBy (the only data-scale pass here)
    per = per.withColumn(
        "cap_docs", F.col("n_docs") * F.lit(max_epochs)
    ).persist()
    a, b = per.alias("a"), per.alias("b")
    key_le = (F.col("b.cap_docs") < F.col("a.cap_docs")) | (
        (F.col("b.cap_docs") == F.col("a.cap_docs"))
        & (F.col(f"b.{lang_col}") <= F.col(f"a.{lang_col}"))
    )
    ranked = (
        a.join(F.broadcast(b), key_le)
        .groupBy(
            F.col(f"a.{lang_col}").alias(lang_col),
            F.col("a.n_docs").alias("n_docs"),
            F.col("a.cap_docs").alias("cap_docs"),
        )
        .agg(
            F.count("*").cast("long").alias("rn"),
            F.sum(F.col("b.cap_docs")).cast("long").alias("cap_prefix"),
        )
    )
    tot = ranked.agg(F.count("*").cast("long").alias("n_langs"))
    ranked = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "constrained",
        F.col("cap_docs") * (F.col("n_langs") - F.col("rn") + 1)
        < F.lit(budget) - (F.col("cap_prefix") - F.col("cap_docs")),
    )
    k = ranked.agg(
        F.sum(F.col("constrained").cast("long")).cast("long").alias("k"),
        F.sum(
            F.when(F.col("constrained"), F.col("cap_docs")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cap_k"),
    )
    out = ranked.crossJoin(F.broadcast(k)).withColumn(
        "alloc_docs",
        F.when(F.col("constrained"), F.col("cap_docs")).otherwise(
            F.expr(f"CAST(({budget} - cap_k) div (n_langs - k) AS BIGINT)")
        ),
    )
    return out.select(
        lang_col,
        "n_docs",
        "cap_docs",
        F.col("alloc_docs").cast("long").alias("alloc_docs"),
        F.expr("CAST(alloc_docs * 10000 div n_docs AS BIGINT)").alias(
            "epochs_e4"
        ),
    )


def calibrated_quality_gate(
    scored: DataFrame,
    by: str = "source",
    pct: float = 0.7,
) -> DataFrame:
    """Per-group calibrated quality thresholding (the CCNet move: raw
    quality/perplexity scores are NOT comparable across sources or
    languages, so the keep-threshold is a per-group quantile, not a global
    constant).  ``scored`` must carry BIGINT ``score`` and the ``by`` key.

    keep ⇔ score·10⁴ ≥ round(percentile_{pct}(score)·10⁴) — the comparison
    runs in scaled integers so the interpolated threshold hashes and gates
    identically in every engine (Spark ``percentile`` and DuckDB
    ``quantile_cont`` are both type-7 linear interpolation).

    Shape: one partial-aggregating groupBy on the bounded ``by`` key for
    the threshold table (rows = #groups, broadcast-sized at any corpus
    scale), then a broadcast join back — the corpus never shuffles.
    """
    thr = scored.groupBy(by).agg(
        F.round(F.expr(f"percentile(score, {pct})") * 10000, 0)
        .cast("long")
        .alias("thr_e4")
    )
    return scored.join(F.broadcast(thr), by).withColumn(
        "keep", F.col("score") * 10000 >= F.col("thr_e4")
    )


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet LM-quality scoring (Wenzek et al. 2020 §3.3 "Language model
    filtering"): train a unigram LM on the corpus itself, score every
    document by its mean token negative-log-likelihood.  CCNet scores with
    a pretrained KenLM; the pipeline shape — token logprob lookup → per-doc
    mean NLL → downstream perplexity buckets — is identical, and a real
    deployment swaps the in-corpus counts table for loaded KenLM unigram
    weights without touching the plan.

    Cross-engine exactness: each token's logprob ln(cnt/N) is computed
    ONCE per distinct vocabulary entry (one division + one ``ln`` + one
    ``round(x·10⁴)`` — the same three IEEE ops in any engine, the tfidf
    precedent) and materialized as a scaled BIGINT; per-document
    aggregation is then pure integer arithmetic (order-free sums, ``div``
    mean), so no float ever enters a many-term engine-ordered sum.

    Shape at 100 TB: the vocabulary table is bounded (≪ corpus) and
    broadcast back onto the token stream; the corpus shuffles once, as
    narrow (doc_id, logp_e4) longs, into the per-doc hash aggregate with
    map-side partials.  Returns (id, n_tokens, nll_sum_e4, mean_nll_e4) —
    mean_nll_e4 is mean token NLL in nats ×10⁴ (lower = more fluent under
    the corpus LM; ppl = exp(mean_nll_e4/10⁴)).
    """
    toks = docs.select(
        id_col,
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    cnts = toks.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    total = cnts.agg(F.sum("cnt").cast("double").alias("t"))
    lp = cnts.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(F.log(F.col("cnt").cast("double") / F.col("t")) * 10000, 0)
        .cast("long")
        .alias("logp_e4"),
    )
    per = toks.join(F.broadcast(lp), "token").groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        (-F.sum("logp_e4")).cast("long").alias("nll_sum_e4"),
    )
    return per.withColumn(
        "mean_nll_e4", F.expr("CAST(nll_sum_e4 div n_tokens AS BIGINT)")
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): weight every raw document
    by how much more likely its tokens are under a TARGET-domain LM than
    under the raw-corpus LM — log w(x) = Σ_tokens [ln p_target(t) −
    ln p_raw(t)] — then keep the highest-importance documents.  DSIR uses
    hashed n-gram LMs; this is the n=1 instance with the same estimator
    shape (swap the counts CTE for hashed n-grams to raise n — the plan is
    unchanged).

    Both LMs are add-one smoothed over the RAW-corpus vocabulary (a token
    absent from the raw corpus cannot occur in a scored document, so the
    raw vocabulary is the whole join domain), which gives target-unseen
    tokens a finite penalty instead of −∞ — the weight is defined for
    every document.  Cross-engine exactness follows the
    unigram_lm_scores recipe: each distinct token's log-ratio is
    materialized once as a scaled BIGINT (two ln + one subtraction on
    doubles — fixed op chain), per-document aggregation is pure integer
    arithmetic.

    Shape at 100 TB: two bounded vocabulary aggregates (map-side
    combinable), a broadcast token→ratio table onto the token stream, one
    narrow (id, long) per-doc hash aggregate.  Returns
    (id, n_tokens, logw_e4) — logw_e4 > 0 means "more target-like than the
    raw corpus"; callers gate at a percentile (calibrated_quality_gate) or
    top-k sample.
    """
    def _toks(df: DataFrame) -> DataFrame:
        return df.select(
            id_col,
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("token"),
        ).filter(F.col("token") != "")

    raw_t = _toks(docs)
    cnt_raw = raw_t.groupBy("token").agg(
        F.count("*").cast("long").alias("c_raw")
    )
    cnt_tgt = (
        _toks(target)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c_tgt"))
    )
    vocab = cnt_raw.join(cnt_tgt, "token", "left").na.fill({"c_tgt": 0})
    totals = vocab.agg(
        F.sum("c_raw").cast("double").alias("n_raw"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
        F.count("*").cast("double").alias("v"),
    )
    ratio = vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(
            (
                F.log((F.col("c_tgt").cast("double") + 1.0) / (F.col("n_tgt") + F.col("v")))
                - F.log((F.col("c_raw").cast("double") + 1.0) / (F.col("n_raw") + F.col("v")))
            )
            * 10000,
            0,
        )
        .cast("long")
        .alias("logr_e4"),
    )
    return raw_t.join(F.broadcast(ratio), "token").groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("logr_e4").cast("long").alias("logw_e4"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Context-length chunking: split each document into fixed windows of
    ``chunk_tokens`` whitespace tokens advancing by ``stride`` (overlap =
    chunk − stride keeps boundary context, the standard pretraining move).

    n_chunks = 1 + ⌈(n − chunk)/stride⌉ via INTEGER div, so the count is
    exact in any engine; the window index explodes from ``sequence`` —
    pure map-side array ops, no shuffle, no UDF, output rows ∝ tokens.
    Emits md5 of each chunk's text (narrow, hashable) rather than the text
    itself; a materializing pipeline swaps the md5 for the joined slice.
    """
    if stride <= 0 or chunk_tokens < stride:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    n_chunks = F.when(F.col("__n") <= chunk_tokens, F.lit(1)).otherwise(
        F.expr(
            f"CAST(1 + ((__n - {chunk_tokens}) + {stride - 1}) div {stride}"
            " AS INT)"
        )
    )
    e = d.withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)),
    )
    start = F.col("chunk_idx") * stride
    n_here = F.least(F.lit(chunk_tokens), F.col("__n") - start)
    return e.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        n_here.cast("long").alias("n_chunk_tokens"),
        F.md5(
            F.array_join(F.slice(F.col("__toks"), start + 1, n_here), " ")
        ).alias("chunk_md5"),
    )


def doremi_weights(
    losses: DataFrame,
    domain_col: str = "source",
    proxy_col: str = "loss_proxy_e4",
    ref_col: str = "loss_ref_e4",
    smoothing_e6: int = 100_000,
) -> DataFrame:
    """One multiplicative-weights step of DoReMi domain reweighting (Xie
    et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
    Model Pretraining"): given per-document proxy-model and reference-model
    losses (scaled-BIGINT ``*_e4``; a real run plugs in measured losses,
    the plan is unchanged), compute per-domain excess loss, exponentiate
    (step size eta = 1, the paper's Alg. 1 with uniform alpha_0 folded into
    the normalization), normalize, and smooth with the uniform
    distribution:

        excess_e4  = (sum_docs max(0, proxy - ref)) div n_docs
        f_e6       = round(exp(excess_e4 / 10^4) * 10^6)      [once/domain]
        weight_e6  = (f_e6 * 10^6) div sum_domains(f_e6)
        final_e6   = ((10^6 - smoothing_e6) * weight_e6) div 10^6
                     + smoothing_e6 div n_domains

    The ONLY float is exp() of an exact small double (excess_e4 / 10^4 is
    one IEEE division of an integer-valued double), computed once per
    domain and rounded to e6 — the ln-rounded-once precedent — so every
    downstream value is exact 64-bit integer arithmetic, identical in any
    engine.  Floor-division makes the final weights sum to slightly under
    10^6; DoReMi consumes them as relative sampling odds, where the
    at-most-(k+1)e-6 deficit is immaterial.

    Shape at 100 TB: one bounded-key (domain) aggregate over the corpus —
    map-side combinable — then all remaining arithmetic happens on the
    k-row domain table with two one-row broadcast scalars (sum_f,
    n_domains).  Nothing after the first aggregate touches corpus-sized
    data.

    Returns one row per domain: (domain, n_docs, excess_e4, weight_e6,
    final_e6).
    """
    per = losses.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.greatest(F.col(proxy_col) - F.col(ref_col), F.lit(0)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("__sum_excess"),
    )
    per = per.withColumn(
        "excess_e4", F.expr("CAST(__sum_excess div n_docs AS BIGINT)")
    ).withColumn(
        "f_e6",
        F.round(
            F.exp(F.col("excess_e4").cast("double") / F.lit(10000.0))
            * 1000000
        ).cast("long"),
    )
    tot = per.agg(
        F.sum("f_e6").cast("long").alias("__sum_f"),
        F.count("*").cast("long").alias("__k"),
    )  # one row
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "weight_e6", F.expr("CAST(f_e6 * 1000000 div __sum_f AS BIGINT)")
        )
        .withColumn(
            "final_e6",
            F.expr(
                f"CAST((1000000 - {smoothing_e6}) * weight_e6 div 1000000 "
                f"+ {smoothing_e6} div __k AS BIGINT)"
            ),
        )
        .select("domain", "n_docs", "excess_e4", "weight_e6", "final_e6")
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Tokenizer-training preparation: corpus-wide adjacent-symbol pair
    frequencies — the statistic byte-pair encoding's merge rounds maximize
    (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
    Words with Subword Units", ACL).  Words are the whitespace tokens of
    ``lower(trim(text))``; symbols start as single characters, so every
    occurrence of every in-word character bigram votes once
    (occurrence-weighted — BPE weighs merge candidates by word frequency).
    This is the per-round counting kernel; a full merge LOOP re-pairs only
    the words containing the chosen pair each round (the documented
    extension), exactly as the reference's crawl loop re-fetches only the
    due subset per generation.

    Returns the ``top_k`` (pair, n_occ) rows under the total order
    (n_occ DESC, pair ASC) — strict (pair is the group key), so the LIMIT
    boundary is deterministic in any engine.

    Scale shape: both explodes are pure map-side generators (no shuffle);
    the only exchange is the groupBy(pair) hash aggregate whose key domain
    is bounded by alphabet² — map-side partial combine collapses virtually
    all traffic before the shuffle — and the top-k is a TakeOrdered, never
    a global sort.  At 100 TB the pair table stays KB-sized regardless of
    corpus size, so the reduce side is a formality.
    """
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), F.col("pair").asc())
        .limit(top_k)
    )
