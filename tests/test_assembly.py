"""Semantics tests for the dataset-assembly operators (holdout splits,
hashed linear quality model, source-mix weights).

Engine-vs-oracle parity is covered by tools/check_oracle.py and the driver
gate; these pin the *properties* the operators promise: split assignments
are stable under corpus growth, the hashed model is deterministic with a
roughly balanced sign, and the mix quotas never oversubscribe the budget.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


def test_split_is_stable_under_corpus_growth(spark):
    """A document's split is a pure function of (salt, key): assigning over
    half the corpus and over the whole corpus must agree on the shared ids —
    the contamination-safety property that keeps eval sets clean."""
    from crawler_spark.operators.assembly import assign_split

    full = assign_split(_docs(spark), "doc_id")
    half = assign_split(_docs(spark).filter(F.col("doc_id") % 2 == 0), "doc_id")
    joined = (
        full.alias("f")
        .join(half.alias("h"), "doc_id")
        .filter(F.col("f.split") != F.col("h.split"))
    )
    assert joined.count() == 0


def test_split_fractions_and_salt_independence(spark):
    from crawler_spark.operators.assembly import assign_split

    n = _docs(spark).count()
    by = {
        r["split"]: r["c"]
        for r in assign_split(_docs(spark), "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    # ~5% / ~5% / ~90% with slack for a 500-doc corpus
    assert 0.02 * n <= by.get("test", 0) <= 0.09 * n
    assert 0.02 * n <= by.get("valid", 0) <= 0.09 * n
    assert by.get("train", 0) >= 0.8 * n
    # a different salt reshuffles the assignment (not a constant function)
    other = assign_split(_docs(spark), "doc_id", salt="split2")
    moved = (
        assign_split(_docs(spark), "doc_id")
        .alias("a")
        .join(other.alias("b"), "doc_id")
        .filter(F.col("a.bucket") != F.col("b.bucket"))
        .count()
    )
    assert moved > 0.9 * n


def test_hashed_model_deterministic_and_balanced(spark):
    from crawler_spark.operators.assembly import hashed_linear_score

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    a = {r.doc_id: r.score for r in hashed_linear_score(docs).collect()}
    b = {r.doc_id: r.score for r in hashed_linear_score(docs).collect()}
    assert a == b
    keeps = sum(1 for s in a.values() if s > 0)
    # pseudo-weights are zero-mean: keep-rate lands well inside (0, 1)
    assert 0.2 < keeps / len(a) < 0.8


def test_source_mix_quota_never_oversubscribes(spark):
    from crawler_spark.operators.assembly import source_mix_weights

    rows = source_mix_weights(_docs(spark), budget=1000).collect()
    assert sum(r.quota_docs for r in rows) <= 1000
    assert all(r.weight_e6 >= 0 for r in rows)
    assert sum(r.weight_e6 for r in rows) <= 1_000_000
    # sqrt temperature flattens the mix: the largest source's weight share
    # never exceeds its document share (power-mean inequality; equality when
    # all counts match, plus integer-floor slack)
    tot_docs = sum(r.n_docs for r in rows)
    big = max(rows, key=lambda r: r.n_docs)
    assert big.weight_e6 / 1_000_000 <= big.n_docs / tot_docs + 0.01


def test_calibrated_gate_thresholds_per_group(spark):
    """Per-group calibration: each source keeps its own top ~30% even when
    one source's WORST score beats another's best — the CCNet property a
    global threshold cannot give."""
    from crawler_spark.operators.assembly import calibrated_quality_gate

    rows = [(i, "a", i) for i in range(1, 11)] + [
        (100 + i, "b", 100 + i) for i in range(1, 11)
    ]
    scored = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = {r.doc_id: r for r in calibrated_quality_gate(scored, pct=0.7).collect()}
    # p70 of 1..10 interpolates to 7.3 -> keep 8, 9, 10 (same shifted for b)
    assert {d for d, r in out.items() if r.keep and r.source == "a"} == {8, 9, 10}
    assert {d for d, r in out.items() if r.keep and r.source == "b"} == {108, 109, 110}
    # b's dropped scores all exceed a's kept ones - only per-group works
    assert min(d for d, r in out.items() if r.source == "b") > 10


def test_chunk_documents_tiles_with_overlap(spark):
    """Chunks advance by stride, overlap by chunk-stride, clip at the end,
    always reach the last token, and hash the exact token slice."""
    import hashlib

    from crawler_spark.operators.assembly import chunk_documents

    text = " ".join(f"t{i}" for i in range(50))  # 50 tokens
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=32, stride=24).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    one = [r for r in rows if r.doc_id == 1]
    # 50 tokens -> chunks at 0 (32 toks) and 24 (26 toks)
    assert [(r.start_tok, r.n_chunk_tokens) for r in one] == [(0, 32), (24, 26)]
    assert one[-1].start_tok + one[-1].n_chunk_tokens == 50
    toks = text.split()
    want = hashlib.md5(" ".join(toks[24:50]).encode()).hexdigest()
    assert one[1].chunk_md5 == want
    short = [r for r in rows if r.doc_id == 2]
    assert [(r.start_tok, r.n_chunk_tokens) for r in short] == [(0, 3)]


def test_chunk_documents_matches_python_reference_on_random_lengths(spark):
    """Window count/starts/lengths replay a Python reference for random
    token counts across the short-doc and exact-boundary regimes."""
    import random

    rng = random.Random(11)
    lens = [rng.randint(1, 90) for _ in range(40)] + [32, 33, 56, 57, 8, 24]
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    from crawler_spark.operators.assembly import chunk_documents

    got = {}
    for r in chunk_documents(docs, chunk_tokens=32, stride=24).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_tok, r.n_chunk_tokens)
        )
    for i, n in enumerate(lens):
        n_chunks = 1 if n <= 32 else 1 + ((n - 32) + 23) // 24
        want = [
            (c, c * 24, min(32, n - c * 24)) for c in range(n_chunks)
        ]
        assert sorted(got[i]) == want, (i, n)
        # full coverage: last window reaches the final token
        assert want[-1][1] + want[-1][2] == n


def test_unigram_lm_scores_match_python_reference(spark):
    """unigram_lm_scores == a literal Python unigram LM: per-token
    logp = round(ln(cnt/N)*1e4) as an integer, per-doc exact integer sums,
    integer-div mean.  Repeated tokens weigh once per occurrence; a doc of
    rare tokens scores a strictly higher mean NLL than one of common
    tokens."""
    import math

    from crawler_spark.operators.assembly import unigram_lm_scores

    docs = [
        (1, "the the the cat"),
        (2, "the cat sat"),
        (3, "zyx qwv"),           # rare tokens → tail-ish score
        (4, "The THE the"),       # lowercased → all 'the'
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in unigram_lm_scores(df).collect()}

    toks = {d: t.lower().split() for d, t in docs}
    cnt: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    n = sum(cnt.values())
    lp = {t: round(math.log(c / n) * 10000) for t, c in cnt.items()}
    for d, ts in toks.items():
        nll = -sum(lp[t] for t in ts)
        assert (out[d].n_tokens, out[d].nll_sum_e4, out[d].mean_nll_e4) == (
            len(ts),
            nll,
            nll // len(ts),
        ), d
    # ordering sanity: the all-common doc beats the all-rare doc
    assert out[4].mean_nll_e4 < out[3].mean_nll_e4


def test_unimax_allocation_matches_greedy_waterfilling(spark):
    """unimax_allocation's closed-form prefix-sum waterfilling == the
    literal greedy loop of Chung et al. 2023: visit languages by ascending
    cap; a language whose cap is below the current fair share takes its
    full cap, the first language at or above the fair share freezes the
    integer share for everyone remaining."""
    from crawler_spark.operators.assembly import unimax_allocation

    def greedy(counts: dict[str, int], budget: int, epochs: int):
        caps = sorted(
            ((c * epochs, lang) for lang, c in counts.items())
        )
        alloc, b_rem = {}, budget
        remaining = len(caps)
        for i, (cap, lang) in enumerate(caps):
            if cap * remaining < b_rem:
                alloc[lang] = cap
                b_rem -= cap
                remaining -= 1
            else:
                share = b_rem // remaining
                for _, l2 in caps[i:]:
                    alloc[l2] = share
                break
        return alloc

    cases = [
        ({"en": 50, "zh": 20, "de": 10, "fr": 10, "es": 10}, 150, 2),
        ({"en": 50, "zh": 20, "de": 10, "fr": 10, "es": 10}, 40, 2),
        # budget above total caps: everyone is constrained, budget unspent
        ({"en": 5, "zh": 3}, 100, 2),
        # cap tie broken by language name
        ({"aa": 10, "bb": 10, "cc": 40}, 55, 1),
    ]
    for counts, budget, epochs in cases:
        rows = [
            (i, lang)
            for lang, c in counts.items()
            for i in range(c)
        ]
        df = spark.createDataFrame(
            [(i, lang) for i, (_, lang) in enumerate(rows)],
            ["doc_id", "lang"],
        )
        got = {
            r.lang: r
            for r in unimax_allocation(
                df, budget=budget, max_epochs=epochs
            ).collect()
        }
        want = greedy(counts, budget, epochs)
        assert {k: v.alloc_docs for k, v in got.items()} == want, (
            counts,
            budget,
            epochs,
        )
        for lang, r in got.items():
            assert r.cap_docs == counts[lang] * epochs
            assert r.alloc_docs <= r.cap_docs
            assert r.epochs_e4 == r.alloc_docs * 10000 // counts[lang]
        assert sum(want.values()) <= budget

    with pytest.raises(ValueError):
        unimax_allocation(
            spark.createDataFrame([(1, "en")], ["doc_id", "lang"]), budget=0
        )


def test_dsir_importance_matches_python_reference(spark):
    """dsir_importance == a literal Python add-one-smoothed unigram
    log-likelihood-ratio pass; docs made of target-domain tokens weigh
    strictly higher than off-domain docs."""
    import math

    from crawler_spark.operators.assembly import dsir_importance

    raw = [
        (1, "alpha beta alpha"),
        (2, "gamma delta gamma delta"),
        (3, "alpha alpha alpha"),
    ]
    tgt = [(10, "alpha beta"), (11, "alpha alpha beta")]
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    out = {r.doc_id: r for r in dsir_importance(raw_df, tgt_df).collect()}

    c_raw: dict[str, int] = {}
    c_tgt: dict[str, int] = {}
    for _, t in raw:
        for tok in t.split():
            c_raw[tok] = c_raw.get(tok, 0) + 1
    for _, t in tgt:
        for tok in t.split():
            c_tgt[tok] = c_tgt.get(tok, 0) + 1
    # vocabulary = raw-side tokens (the join domain), target counts mapped in
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.get(t, 0) for t in c_raw)
    v = len(c_raw)
    lr = {
        t: round(
            (
                math.log((c_tgt.get(t, 0) + 1) / (n_tgt + v))
                - math.log((c + 1) / (n_raw + v))
            )
            * 10000
        )
        for t, c in c_raw.items()
    }
    for did, text in raw:
        toks = text.split()
        assert (out[did].n_tokens, out[did].logw_e4) == (
            len(toks),
            sum(lr[t] for t in toks),
        ), did
    # alpha/beta are target-like; gamma/delta are not
    assert out[3].logw_e4 > 0 > out[2].logw_e4
    assert out[1].logw_e4 > out[2].logw_e4


def test_doremi_weights_matches_python_reference(spark):
    """doremi_weights == a literal restatement of the DoReMi step with
    Python ints + math.exp, including the zero-excess domain."""
    import math

    from crawler_spark.operators.assembly import doremi_weights

    rows = [
        ("d0", 9000, 1000),  # high excess
        ("d0", 5000, 5000),
        ("d1", 2000, 1500),  # small excess
        ("d2", 1000, 9000),  # negative -> clamped to 0
        ("d2", 0, 0),
    ]
    df = spark.createDataFrame(
        rows, "source string, loss_proxy_e4 long, loss_ref_e4 long"
    )
    got = {r.domain: r for r in doremi_weights(df).collect()}

    per = {}
    for dom, p, r in rows:
        n, se = per.get(dom, (0, 0))
        per[dom] = (n + 1, se + max(0, p - r))
    f_e6 = {
        dom: round(math.exp((se // n) / 10000.0) * 1000000)
        for dom, (n, se) in per.items()
    }
    sum_f, k = sum(f_e6.values()), len(f_e6)
    for dom, (n, se) in per.items():
        w = f_e6[dom] * 1000000 // sum_f
        final = (1000000 - 100000) * w // 1000000 + 100000 // k
        assert got[dom].n_docs == n, dom
        assert got[dom].excess_e4 == se // n, dom
        assert got[dom].weight_e6 == w, dom
        assert got[dom].final_e6 == final, dom
    # clamped domain carries zero excess but nonzero smoothed weight
    assert got["d2"].excess_e4 == 0 and got["d2"].final_e6 > 0


def test_bpe_pair_counts_matches_python_reference(spark):
    """The BPE merge-round counting kernel replays exactly in pure Python:
    occurrence-weighted in-word character bigram counts, top-50 under the
    strict (count DESC, pair ASC) total order — including the order and
    the LIMIT boundary."""
    from collections import Counter

    from crawler_spark.operators.assembly import bpe_pair_counts

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    got = [
        (r.pair, r.n_occ)
        for r in bpe_pair_counts(docs, top_k=50).collect()
    ]

    counts: Counter[str] = Counter()
    for row in docs.select("text").collect():
        for w in row.text.strip().lower().split():
            if len(w) >= 2:
                counts.update(w[i : i + 2] for i in range(len(w) - 1))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == want
