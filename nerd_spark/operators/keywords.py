"""Corpus keyword extraction: per-document top-k terms by TF-IDF.

The classic two-aggregation shape, fully JVM-side:
- term frequencies: one shuffle on (doc, term) — partial counts
  collapse map-side, so the exchange carries distinct pairs only;
- document frequencies: the (doc, term) frame is already distinct,
  so df = count per term with no second pass over text;
- idf join: the term-df table is tiny relative to the corpus
  (vocabulary-sized) and broadcasts;
- top-k: WindowGroupLimit keeps <= k rows per doc before the window
  sort — never a global rank of all (doc, term) scores.

At 100 TB the only corpus-sized shuffle is the first groupBy; the
vocabulary table is the broadcast side by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nerd_spark.functions.text import tokens


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, score, rank) — the top-k terms of each doc
    by tf * ln(n_docs / df), ties broken by term asc. Documents with
    no tokens produce no rows (split of empty/whitespace-only text
    yields [''], which would otherwise pollute the vocabulary with a
    bogus '' term — filtered right after the explode)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    # tf feeds TWO consumers (the df aggregation and the score join),
    # and exchange reuse does not cover the shared subtree here — the
    # corpus was scanned+tokenized+shuffled on both sides (3 FileScans
    # in the single-plan form). Materializing the (doc, term, tf)
    # waist once is the funnel-waist discipline (corpus_curation
    # precedent): measured 13.7 -> 11.3 s at the 80x point. On a
    # cluster, .checkpoint()/a parquet write is the fault-tolerant
    # equivalent.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    # corpus size as a broadcast single-row frame: no driver collect
    n_docs = docs.select(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — mean unigram log-probability
    of each document under the corpus's own unigram model, the
    perplexity-proxy quality signal (fluency filtering à la KenLM,
    reduced to its distributable core: low avg logprob = rare-token
    soup = drop candidate).

    Two shuffles total, both on small frames: token frequencies over
    the corpus (vocabulary-sized result, broadcast back), then the
    per-doc mean. p(t) = count(t) / total_tokens; no OOV mass is
    needed because the model scores the corpus it was counted on. In
    a train/apply split the vocabulary table persists like the
    minhash band index and scoring is map-only. Empty/whitespace-only
    documents contribute no tokens (and produce no row) — the ''
    artifact of split() is filtered out of the vocabulary."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = toks.select(F.count("*").alias("total"))
    return (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "avg_logprob"
            ),
        )
    )
