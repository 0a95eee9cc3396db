"""Corpus keyword extraction: per-document top-k terms by TF-IDF,
plus the unigram-LM fluency score.

Term counting is MAP-SIDE: instead of exploding every token into the
exchange (corpus-token-sized shuffle) and hash-aggregating (doc, term)
pairs, each document run-length-encodes its own sorted token array
with codegen HOFs — the classic word-count shuffle disappears
entirely, and the only thing that ever leaves the scan stage is the
already-distinct (doc, term, tf) pairs. Measured at the 80x design
point (400k docs): tfidf 11.4 -> 5.3 s warm, unigram 7.8 -> 4.0 s —
and the shuffle carries per-doc vocabularies instead of every token
occurrence (~5-20x fewer bytes on natural text), the win that grows
on a real network.

CRITICAL expression-binding subtlety (measured, not theoretical): a
HOF lambda that references an outer EXPRESSION re-evaluates it per
array element — nesting the whole RLE as one Column made the sorted
token array (tokenize + filter + sort) re-run inside every `get(s,i)`
comparison, O(n^2) with string-split constants: 42 s at sf0.1 vs
0.6 s for the form below. The fix is to bind each intermediate to a
real column attribute via stacked select()s, so lambdas capture an
AttributeReference (one array read) instead of a subtree. Catalyst's
CollapseProject preserves the stacking because it refuses to merge
projections that would duplicate a non-cheap expression referenced
more than once (s, starts each feed 2+ consumers) — pinned by a plan
test so a future optimizer change can't silently re-nest it.

Remaining plan shape, fully JVM-side:
- (doc_id, term_counts) waist materialized once — it feeds two
  consumers (the df/vocabulary aggregation and the score join) and
  exchange reuse does not cover shared subtrees (measured on the old
  form: 3 corpus scans in the single-plan version). No repartition
  before the checkpoint: LogicalRDD does not propagate hash
  partitioning to the window requirement, so a doc_id repartition
  costs a shuffle without removing the window exchange (measured:
  equal warm, 3x worse cold). On a cluster, .checkpoint()/a parquet
  write is the fault-tolerant equivalent of localCheckpoint.
- vocabulary tables (df / unigram counts) are vocabulary-sized and
  broadcast back; the corpus side never shuffles again;
- top-k: WindowGroupLimit keeps <= k rows per doc before the window
  sort — never a global rank of all (doc, term) scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nerd_spark.functions.text import tokens


def term_count_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, tc: array<struct<term:string, tf:bigint>>) — per-doc
    term frequencies as a run-length encoding of the sorted token
    array, map-only (no shuffle). Each RLE step lives in its OWN
    projection so HOF lambdas bind attributes, not subtrees (see
    module docstring). Empty/whitespace-only text -> [] (split's ''
    artifact is filtered before the sort, so it can never pollute
    the vocabulary)."""
    s = F.col("s")
    n = F.size(s)
    d1 = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(F.filter(tokens(text_col), lambda t: t != F.lit(""))).alias("s"),
    )
    # positions where a new run starts: i == 0 or s[i] != s[i-1];
    # n == 0 would make sequence(0, -1) walk backwards, so
    # short-circuit to a typed empty array
    d2 = d1.select(
        "doc_id",
        "s",
        F.when(n == F.lit(0), F.expr("array()").cast("array<int>"))
        .otherwise(
            F.filter(
                F.sequence(F.lit(0), n - 1),
                lambda i: (i == F.lit(0)) | (F.get(s, i) != F.get(s, i - 1)),
            )
        )
        .alias("starts"),
    )
    # each run ends where the next begins (the last at n)
    d3 = d2.select(
        "doc_id",
        "s",
        "starts",
        F.concat(
            F.slice("starts", 2, F.greatest(F.size("starts"), F.lit(1))),
            F.array(F.size("s")),
        ).alias("nexts"),
    )
    # zip_with pads to the longer side, so an empty starts against
    # nexts == [n] would fabricate one (null, null) pair — guard the
    # empty-doc case down to a typed empty array
    return d3.select(
        "doc_id",
        F.when(
            F.size("starts") == F.lit(0),
            F.expr("array()").cast("array<struct<term:string,tf:bigint>>"),
        )
        .otherwise(
            F.zip_with(
                "starts",
                "nexts",
                lambda a, b: F.struct(
                    F.get(s, a).alias("term"), (b - a).cast("long").alias("tf")
                ),
            )
        )
        .alias("tc"),
    )


def _tf_waist(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf) — distinct by construction, materialized
    once as the compact per-doc RLE arrays (one row per doc)."""
    from nerd_spark.operators.dedup import waist_checkpoint

    waist = waist_checkpoint(term_count_pairs(docs, id_col, text_col))
    return waist.select("doc_id", F.explode("tc").alias("p")).select(
        "doc_id", "p.term", "p.tf"
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, score, rank) — the top-k terms of each doc
    by tf * ln(n_docs / df), ties broken by term asc. Documents with
    no tokens produce no rows."""
    tf = _tf_waist(docs, id_col, text_col)
    # corpus size as a broadcast single-row frame: no driver collect
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    # tf is distinct (doc, term) by construction -> df = rows per term
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

    p(t) = count(t) / total_tokens; no OOV mass is needed because the
    model scores the corpus it was counted on. In a train/apply split
    the vocabulary table persists like the minhash band index and
    scoring is map-only. The per-doc mean is tf-weighted over the RLE
    pairs — identical to averaging over every token occurrence.
    Empty/whitespace-only documents contribute no tokens (and produce
    no row)."""
    tf = _tf_waist(docs, id_col, text_col)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.select(F.sum("cnt").alias("total"))
    return (
        tf.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("cnt") / F.col("total")))
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
    )
