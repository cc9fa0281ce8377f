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

from pyspark.sql import Column, DataFrame
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


# The eight "must-have" stopwords of the Gopher quality filter (Rae et al.
# 2021, "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher", Table A1): a document must contain at least 2 of them.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, Table A1),
    each rule as a named flag plus the conjunctive ``keep``:

    1. word count in [min_words, max_words];
    2. mean word length in [3, 10] characters;
    3. symbol-to-word ratio ('#' or '...') <= 0.1;
    4. <= 90% of lines start with a bullet ('- ');
    5. <= 30% of lines end with an ellipsis ('...');
    6. >= 80% of words contain at least one alphabetic character;
    7. >= 2 of the 8 must-have stopwords appear.

    All ratios are scaled-BIGINT (``x_e4``) computed with integer division
    or cross-multiplied integer comparisons, so the gate hashes identically
    in any engine — no float ever decides a flag.  Everything is a pure
    Column expression over split/filter/aggregate (whole-stage codegen, no
    UDF, no shuffle): at 100 TB this is a map-only pass.
    """
    t = F.col("__t")
    d = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
        F.split(F.col(text_col), "\n").alias("__l"),
    )
    n_words = F.size("__w").cast("long")
    sum_len = F.aggregate(
        F.transform("__w", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    n_lines = F.size("__l").cast("long")
    n_bullet = F.size(F.filter("__l", lambda x: x.startswith("- "))).cast("long")
    n_ellipsis = F.size(F.filter("__l", lambda x: x.endswith("..."))).cast("long")
    n_alpha = F.size(F.filter("__w", lambda x: x.rlike("[A-Za-z]"))).cast("long")
    n_sym = F.size(
        F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0)
    ).cast("long")
    n_stop = None
    for s in GOPHER_STOPWORDS:
        # case-insensitive, as the published gate matches lower-cased
        # tokens: sentence-initial 'The'/'With' must count
        hit = F.lower(t).rlike(rf"\b{s}\b").cast("long")
        n_stop = hit if n_stop is None else n_stop + hit
    d = d.select(
        id_col,
        n_words.alias("n_words"),
        sum_len.alias("__sum_len"),
        n_lines.alias("n_lines"),
        n_bullet.alias("__n_bullet"),
        n_ellipsis.alias("__n_ellipsis"),
        n_alpha.alias("__n_alpha"),
        n_sym.alias("__n_sym"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    d = d.select(
        id_col,
        "n_words",
        "n_lines",
        "n_stopwords",
        F.expr("CAST(__sum_len * 10000 div n_words AS BIGINT)").alias(
            "mean_word_len_e4"
        ),
        F.expr("CAST(__n_sym * 10000 div n_words AS BIGINT)").alias(
            "symbol_ratio_e4"
        ),
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words))
        .alias("r_word_count"),
        F.expr("__n_bullet * 10 <= n_lines * 9").alias("r_bullet_lines"),
        F.expr("__n_ellipsis * 10 <= n_lines * 3").alias("r_ellipsis_lines"),
        F.expr("__n_alpha * 10 >= n_words * 8").alias("r_alpha_words"),
        (F.col("n_stopwords") >= 2).alias("r_stopwords"),
    )
    d = d.withColumn(
        "r_mean_word_len",
        (F.col("mean_word_len_e4") >= 30000)
        & (F.col("mean_word_len_e4") <= 100000),
    ).withColumn("r_symbol_ratio", F.col("symbol_ratio_e4") <= 1000)
    return d.withColumn(
        "keep",
        F.col("r_word_count")
        & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio")
        & F.col("r_bullet_lines")
        & F.col("r_ellipsis_lines")
        & F.col("r_alpha_words")
        & F.col("r_stopwords"),
    )


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text Transformer",
    §2.2): keep only lines that end in terminal punctuation (. ! ? \"),
    have >= ``min_line_words`` words, and do not mention 'javascript'
    (case-insensitive — 'JavaScript' is the canonical spelling); drop
    whole documents containing 'lorem ipsum' (case-insensitive) or '{',
    or with fewer than ``min_kept_lines`` surviving lines.

    Returns (id, n_lines, n_kept_lines, has_lorem, has_brace, keep,
    text_clean) with text_clean the surviving lines re-joined by newline.
    Pure Column expressions (split + higher-order filter + array_join):
    map-only, no shuffle, no UDF — the 100-TB shape for a per-document
    string pass.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]$')
        & (F.size(F.split(x, " ")) >= min_line_words)
        # case-insensitive: the canonical real-world spellings are
        # 'JavaScript' / 'Lorem Ipsum', and C4's filter matches them
        & ~F.lower(x).contains("javascript"),
    )
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    n_kept = F.size(kept).cast("long")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (n_kept >= min_kept_lines)).alias("keep"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


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
