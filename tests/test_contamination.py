"""Contamination operator: known-overlap fixtures + the no-corpus-
shuffle plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.operators.contamination import ngram_contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_counts(spark):
    # eval doc 100: "a b c d e f g h i" has two distinct 8-grams;
    # train doc 1 contains the first verbatim, train doc 2 neither
    ev = _docs(spark, [(100, "a b c d e f g h i")])
    tr = _docs(
        spark,
        [
            (1, "x y a b c d e f g h z"),
            (2, "totally different words with no overlap at all here"),
        ],
    )
    rows = {
        (r.train_id, r.eval_id, r.shared_ngrams, r.eval_ngrams, r.eval_frac)
        for r in ngram_contamination(tr, ev, n=8).collect()
    }
    assert rows == {(1, 100, 1, 2, 0.5)}


def test_contamination_duplicate_ngrams_count_once(spark):
    # repeated n-gram inside one doc counts once (distinct shingles)
    ev = _docs(spark, [(100, "a b c a b c")])
    tr = _docs(spark, [(1, "z a b c z a b c")])
    rows = ngram_contamination(tr, ev, n=3).collect()
    got = {(r.train_id, r.eval_id, r.shared_ngrams, r.eval_ngrams) for r in rows}
    # eval distinct 3-grams: {a b c, b c a, c a b}; train's distinct
    # set {z a b, a b c, b c z, c z a} shares only "a b c" — and the
    # repeats on both sides still count it ONCE
    assert got == {(1, 100, 1, 3)}


def test_contamination_no_corpus_shuffle(spark, sf_dir):
    """The corpus side must reach the join map-only: eval n-grams are
    broadcast, so the plan has broadcast joins and no shuffle below
    the join (the only exchange aggregates hit rows)."""
    from nerd_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 19 == 3)
    tr = docs.filter(F.col("doc_id") % 19 != 3)
    plan = ngram_contamination(tr, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # exactly one shuffle: the post-join hit aggregation (partial/final
    # HashAggregate pair around it)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
