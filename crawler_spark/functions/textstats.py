"""Text-analysis column functions for the training-data pipeline:
language ID (token-marker heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.

Not in the reference (its text handling is parse/normalize only —
/root/reference/plugin/public/tools.go:204-283); these are the pipeline ops a
100-TB corpus needs before training.  All pure Column expressions —
whole-stage codegen, no UDFs — and every formula mirrors 1:1 into DuckDB SQL
for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker-token lists per language (n-gram/stopword heuristic).  Chosen from
# high-frequency function words; the heuristic is the classic "count marker
# hits, argmax wins, deterministic priority on ties".
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "fast", "slow", "value", "row", "key"],
    "de": ["der", "die", "und", "ist", "nicht", "mit", "ein", "das"],
    "fr": ["le", "la", "et", "est", "les", "des", "une", "dans"],
    "es": ["el", "la", "y", "es", "los", "una", "que", "por"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}

BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, single digits, single punctuation —
    the standard pre-tokenizer upper bound on BPE token count."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def lang_scores(text_col: str = "text") -> list[Column]:
    """Per-language marker-hit scores, normalized by token count."""
    out = []
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        score = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        out.append(score.alias(f"score_{lang}"))
    return out


def lang_predict() -> Column:
    """argmax over score_<lang> columns with fixed priority tie-break
    (en > de > fr > es > zh — first max wins)."""
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred.otherwise(F.lit("und"))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9 ]"), 0))


def stopword_count(text: Column) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0))


def quality_features(text_col: str = "text") -> list[Column]:
    """The standard cheap quality signals: length, tokens, mean word length,
    punctuation ratio, stopword ratio — all double, rounded for oracle
    stability."""
    t = F.col(text_col)
    n_tok = ws_token_count(t).cast("double")
    n_chars = F.length(t).cast("double")
    return [
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round((n_chars - n_tok + 1) / n_tok, 4).alias("mean_word_len"),
        F.round(punct_count(t).cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(stopword_count(t).cast("double") / n_tok, 4).alias("stopword_ratio"),
    ]


def quality_score() -> Column:
    """Composite [0,1] quality score over the quality_features columns —
    the Gopher-rules shape: length band + word-length band + stopword
    presence, expressed as a weighted sum of indicator terms."""
    len_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000)
    mwl_ok = (F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 12.0)
    stop_ok = F.col("stopword_ratio") > 0
    punct_ok = F.col("punct_ratio") < 0.3
    score = (
        len_ok.cast("double") * 0.4
        + mwl_ok.cast("double") * 0.3
        + stop_ok.cast("double") * 0.2
        + punct_ok.cast("double") * 0.1
    )
    return F.round(score, 4)


def fingerprint(text_col: str = "text", k: int = 4) -> Column:
    """Rolling-hash document fingerprint (winnowing-lite): the minimum md5
    over the doc's k-word shingles — a single 128-bit content fingerprint
    that is stable under reordering-free edits elsewhere in the doc.

    Requires ≥ k words (caller filters).  min over hex == binary-collation
    lexicographic min in both engines.
    """
    parts = ", ".join(f"__fw[i - 1 + {j}]" for j in range(k))
    return F.expr(
        f"array_min(transform(sequence(1, size(__fw) - {k - 1}), "
        f"i -> md5(concat_ws(' ', {parts}))))"
    )


def with_fingerprint(df, text_col: str = "text", k: int = 4):
    w = F.split(F.col(text_col), r"\s+")
    return (
        df.withColumn("__fw", w)
        .filter(F.size("__fw") >= k)
        .withColumn("fingerprint", fingerprint(text_col, k))
        .drop("__fw")
    )
