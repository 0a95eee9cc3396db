"""Model-based document quality filtering.

The modern curation step between heuristics and training: a logistic
scorer over the cheap JVM-side quality features (functions/text.py)
gates every document. Weights are injectable — ship defaults give a
reasonable fastText-style "keep" prior over the synthetic corpus;
production weights come from ml/train.logistic_fit on labeled docs
(the same distributed trainer the FMP seam uses, proven in
tests/test_fmp_train.py).

Everything is a closed-form column expression — no UDF, no model
server: score = sigmoid(w·x) composes from exp/ln inside whole-stage
codegen, so the filter runs at scan speed and pushes down with the
rest of the plan. An ANSI-SQL oracle computes the identical score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nerd_spark.functions.text import quality_features

# bias + weights over (ln(1+n_tokens), punct_ratio, stopword_ratio,
# mean_token_len) — the feature order is the contract with any
# trained replacement.
DEFAULT_WEIGHTS = {
    "bias": -2.0,
    "log_tokens": 0.6,
    "punct_ratio": -8.0,
    "stopword_ratio": 2.5,
    "mean_token_len": -0.3,
}


def _score_expr(text_col: str, weights: dict[str, float] | None) -> F.Column:
    """The logistic quality score as a single column expression."""
    w = dict(DEFAULT_WEIGHTS, **(weights or {}))
    q = quality_features(text_col)
    z = (
        F.lit(float(w["bias"]))
        + F.lit(float(w["log_tokens"])) * F.log(F.lit(1.0) + q["n_tokens"])
        + F.lit(float(w["punct_ratio"])) * q["punct_ratio"]
        + F.lit(float(w["stopword_ratio"])) * q["stopword_ratio"]
        + F.lit(float(w["mean_token_len"])) * q["mean_token_len"]
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def quality_scores(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, q_score) — logistic quality score per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _score_expr(text_col, weights).alias("q_score"),
    )


def quality_filter(
    docs: DataFrame,
    threshold: float = 0.5,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append (q_score, kept) to every doc; downstream stages filter
    on `kept` (materializing the flag instead of dropping rows keeps
    the rejection set auditable — the curation-pipeline norm).

    One select, no join: the score is a closed-form expression over
    the row itself, so joining a scored frame back on doc_id would
    re-shuffle the full text for nothing (and multiply rows on a
    duplicate id, which a per-row column can't)."""
    scored = docs.withColumn("q_score", _score_expr(text_col, weights))
    return scored.withColumn("kept", F.col("q_score") >= threshold)


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stopword_hits: int = 2,
    max_punct_ratio: float = 0.1,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style heuristic rule battery (Rae et al. 2021, table A1
    — adapted to the signals this corpus carries; the line/bullet and
    ellipsis rules don't apply to single-line documents and are
    omitted, documented divergence): per-document boolean flags, one
    per rule, plus the conjunctive `keep`. Materializing the flags —
    not just the verdict — is the curation norm: rejection reasons
    stay auditable and thresholds re-tunable without a re-scan.

    Pure column expressions over one scan; the distinct-token ratio
    (the 'fraction of unique words' repetition proxy) is the only
    rule needing the token array itself.
    """
    from nerd_spark.functions.text import quality_features, tokens

    # one shared tokenization for every rule (single-split discipline)
    toks = tokens(text_col)
    q = quality_features(text_col, toks=toks)
    n_stop = q["n_stop"]
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")
    flags = {
        "ok_word_count": (q["n_tokens"] >= min_tokens)
        & (q["n_tokens"] <= max_tokens),
        "ok_mean_word_len": (q["mean_token_len"] >= min_mean_len)
        & (q["mean_token_len"] <= max_mean_len),
        "ok_stopwords": n_stop >= min_stopword_hits,
        "ok_punct_ratio": q["punct_ratio"] <= max_punct_ratio,
        "ok_distinct_ratio": distinct_ratio >= min_distinct_ratio,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    )
