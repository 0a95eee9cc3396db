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
from nerd_spark.operators.cacheutil import tie_unpersist


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


def _bigram_count_fn():
    """EXACT per-batch (w1, w2) adjacent-pair counting at the TEXT
    level — the hh_terms recipe (operators/sketches.py::
    _terms_count_fn) applied to bigrams: one Arrow transfer of the
    text column per batch in, batch-distinct (w1, w2, c) pairs out,
    so no per-occurrence pair row is ever materialized for the model
    build (r8 verdict #2: pair-row granularity in the count shuffles
    was THE bigram cost).

    Vectorization: per-pair Python objects would make the kernel the
    new bottleneck (43M pairs/batch-set at 160x), so tokens are
    factorized once (pd.factorize, C-level hashing of byte tokens)
    and a pair becomes ONE int64 ``code(w1) * K + code(w2)`` —
    adjacency, doc-boundary masking, and counting are then pure numpy
    (shifted slices + value_counts); only the batch-DISTINCT pairs
    are ever decoded back to strings.

    Tokenization parity with tokens() (split(trim(text), '\\s+'),
    Java semantics): trim strips 0x20 only; ``bytes.split()`` splits
    on exactly Java's six \\s bytes; non-ASCII docs take the
    Java-class regex slow path. The ''-artifacts of leading/trailing
    whitespace can only sit at the sequence ends (a separator RUN
    yields one split), so the kept pairs — both sides non-empty —
    are exactly the adjacent pairs of the non-empty token sequence,
    which is what both paths produce directly."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    def count(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            toks: list = []
            lens: list = []
            for s in pdf["k"]:
                if s is None:
                    continue
                if s.isascii():
                    t = s.strip(" ").encode("ascii").split()
                else:
                    t = [
                        w.encode("utf-8")
                        for w in _RX_JSPLIT.split(s.strip(" "))
                        if w
                    ]
                toks.extend(t)
                lens.append(len(t))
            if len(toks) < 2:
                continue
            arr = np.empty(len(toks), dtype=object)
            arr[:] = toks
            codes, uniques = pd.factorize(arr)
            k_card = np.int64(len(uniques))
            pc = codes[:-1].astype(np.int64) * k_card + codes[1:]
            # mask pairs that cross a document boundary: the pair
            # starting at each doc's last token (empty docs fold onto
            # the previous end — already masked; a leading empty doc
            # yields end=-1, which must not wrap onto the final pair)
            ends = np.cumsum(np.asarray(lens, dtype=np.int64)) - 1
            valid = np.ones(len(toks) - 1, dtype=bool)
            bnd = ends[(ends >= 0) & (ends < len(toks) - 1)]
            valid[bnd] = False
            vc = pd.Series(pc[valid]).value_counts()
            if len(vc) == 0:
                continue
            pcs = vc.index.to_numpy()
            yield pd.DataFrame(
                {
                    "w1": [uniques[i].decode("utf-8") for i in pcs // k_card],
                    "w2": [uniques[i].decode("utf-8") for i in pcs % k_card],
                    "c": vc.to_numpy(),
                }
            )

    return count


def _bigram_score_fn(model_bc):
    """Per-doc bigram scoring at the TEXT level against a broadcast
    model: (doc_id, n_bigrams, sum_lp) out — ONE row per document, so
    neither pair rows nor per-doc pair RLE ever cross an exchange or
    the Arrow boundary. Same factorize vectorization and tokenization
    parity as :func:`_bigram_count_fn`; the model lookup is one
    C-speed pandas hash merge per batch over the batch-DISTINCT
    pairs (model w1/w2 are bytes, matching the kernel's token dtype).
    Every pair is in the model by construction (it was counted from
    the same corpus), so a missing lookup is a parity BUG — it
    surfaces as a NaN sum, never a silent drop."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        model = model_bc.value  # pandas DF: w1 bytes, w2 bytes, lp
        for pdf in batches:
            toks: list = []
            lens: list = []
            ids: list = []
            for did, s in zip(pdf["doc_id"], pdf["k"]):
                if s is None:
                    continue
                if s.isascii():
                    t = s.strip(" ").encode("ascii").split()
                else:
                    t = [
                        w.encode("utf-8")
                        for w in _RX_JSPLIT.split(s.strip(" "))
                        if w
                    ]
                toks.extend(t)
                lens.append(len(t))
                ids.append(did)
            if len(toks) < 2:
                continue
            arr = np.empty(len(toks), dtype=object)
            arr[:] = toks
            codes, uniques = pd.factorize(arr)
            k_card = np.int64(len(uniques))
            pc = codes[:-1].astype(np.int64) * k_card + codes[1:]
            np_lens = np.asarray(lens, dtype=np.int64)
            ends = np.cumsum(np_lens) - 1
            valid = np.ones(len(toks) - 1, dtype=bool)
            bnd = ends[(ends >= 0) & (ends < len(toks) - 1)]
            valid[bnd] = False
            pcv = pc[valid]  # in doc order, boundary pairs removed
            if len(pcv) == 0:  # e.g. a batch of only 1-token docs
                continue
            # lp per distinct pair code via ONE hash merge
            uq = np.unique(pcv)
            lk = pd.DataFrame(
                {"w1": uniques[uq // k_card], "w2": uniques[uq % k_card]}
            )
            lp_vals = lk.merge(model, on=["w1", "w2"], how="left")[
                "lp"
            ].to_numpy()
            lp_per_pair = lp_vals[np.searchsorted(uq, pcv)]
            # per-doc segment sums over docs that kept >= 1 pair
            n_pairs = np.maximum(np_lens - 1, 0)
            keep = n_pairs > 0
            starts = np.concatenate(([0], np.cumsum(n_pairs)[:-1]))[keep]
            sums = np.add.reduceat(lp_per_pair, starts)
            id_arr = np.empty(len(ids), dtype=object)  # keep id dtype as-is
            id_arr[:] = ids
            yield pd.DataFrame(
                {
                    "doc_id": id_arr[keep],
                    "n_bigrams": n_pairs[keep],
                    "sum_lp": sums,
                }
            )

    return score


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_broadcast_max_pairs: int = 1_000_000,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — mean CONDITIONAL bigram
    log-probability p(w2|w1) = c(w1,w2)/c(w1·) of each document under
    the corpus's own bigram model: the next step up from
    :func:`unigram_logprob` on the fluency axis (word-order soup
    scores low even when every individual token is common).

    Like the unigram form, the model scores the corpus it was counted
    on, so every observed pair has positive probability and no
    smoothing/OOV mass is needed; in a train/apply split the bigram
    table persists like the minhash band index and scoring is
    map-only. Pairs come from the raw token sequence (adjacent array
    elements); pairs touching the ''-token artifacts of leading/
    trailing whitespace are dropped, matching the unigram term filter.
    Documents with fewer than 2 tokens produce no row.

    Plan shape (r9, the hh_terms recipe the r8 verdict prescribed,
    pushed one step further because the recipe alone missed the bar):

    - MODEL build is one text-level kernel pass
      (:func:`_bigram_count_fn`): batch-distinct (w1, w2, c) out, so
      per-occurrence pair rows never exist on the model side. The
      left-conditional total c(w1·) is derived FROM the bigram table
      (sum over w2), never from a second corpus pass.
    - SCORING takes one of two paths on a MEASURED model-size probe
      (the `_pair_jaccard` bounded-broadcast discipline — never an
      estimate, never unbounded):
      * model <= `score_broadcast_max_pairs`: the model (with lp =
        log(c2/c1) precomputed driver-side — a bounded driver
        artifact, like the k-means centroid and PQ codebook
        collects) broadcasts to a second text-level kernel
        (:func:`_bigram_score_fn`) that emits ONE row per doc — no
        pair row ever materializes anywhere. Memory: the bound caps
        the broadcast at ~90 MB per Python worker (2 object columns
        + a float64), sized for 32 local workers in 128 GiB.
      * over the bound: JVM zip_with/explode pairs (streamed through
        the join probe, never stored — the measured AGGREGATE_OOM at
        160x forbids checkpointing fat pair frames) joined UNHINTED
        with the model (Spark broadcasts while small, shuffles on
        (w1, w2) otherwise — the r8 review caught a forced broadcast
        here), then a per-doc aggregation. Slower but bounded by
        executor memory only.

    Measured at 160x (800k docs, 43M pairs), warm, bench noop-write
    convention: the r7 three-explode-pass form ~12.6 s; kernel model
    + JVM explode scoring (the literal r8 recipe) ~9.5 s — the
    explode+per-doc-agg pass alone costs 5.4 s, over the whole 1.5x
    budget, which is why the recipe got the extra step; kernel model
    + kernel scoring 2.7 s vs the DuckDB comparator's 3.9 s
    (3.0x -> 0.69x)."""
    spark = docs.sparkSession
    bg = (
        docs.select(F.col(text_col).alias("k"))
        .mapInPandas(_bigram_count_fn(), "w1 string, w2 string, c long")
        .groupBy("w1", "w2")
        .agg(F.sum("c").alias("c2"))
        .persist()
        # consumed by the probe + one of the two paths. The small
        # path unpersists explicitly after toPandas; the over-bound
        # JVM path keeps it inside the returned plan (c1 window + lp
        # join) — lifetime tied to the returned frame
        # (cacheutil.tie_unpersist).
    )
    small = (
        bg.limit(score_broadcast_max_pairs + 1).count()
        <= score_broadcast_max_pairs
    )
    if small:
        import numpy as np

        mpdf = bg.toPandas()
        bg.unpersist()
        c2 = mpdf["c2"].to_numpy(dtype=np.float64)
        c1 = mpdf.groupby("w1")["c2"].transform("sum").to_numpy(
            dtype=np.float64
        )
        model = mpdf.assign(
            w1=[w.encode("utf-8") for w in mpdf["w1"]],
            w2=[w.encode("utf-8") for w in mpdf["w2"]],
            lp=np.log(c2 / c1),
        )[["w1", "w2", "lp"]]
        model_bc = spark.sparkContext.broadcast(model)
        idt = docs.schema[id_col].dataType.simpleString()
        scored = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("k")
        ).mapInPandas(
            _bigram_score_fn(model_bc),
            f"doc_id {idt}, n_bigrams long, sum_lp double",
        )
        return scored.select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("sum_lp") / F.col("n_bigrams"), 6).alias(
                "avg_logprob"
            ),
        )
    arr = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("a"))
        .filter(F.size("a") >= 2)
    )
    paired = arr.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("a"), 1, F.size("a") - 1),
                F.slice(F.col("a"), 2, F.size("a") - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("pr"),
    ).select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    pairs = paired.filter((F.col("w1") != "") & (F.col("w2") != ""))
    bgj = bg.withColumn(
        "c1", F.sum("c2").over(Window.partitionBy("w1"))
    ).select(
        "w1", "w2", F.log(F.col("c2") / F.col("c1")).alias("lp")
    )
    return tie_unpersist(
        pairs.join(bgj, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        ),
        bg,
    )


# ---------------------------------------------------------------------------
# Byte-LUT token statistics


def _tokstats_lut():
    """256-entry byte classifier matching the JVM regex classes the
    token-stats expressions use: 0 = Java \\s byte, 1 = [A-Za-z],
    2 = [0-9], 3 = other printable (each matches [^A-Za-z0-9\\s] alone),
    4 = control byte OUTSIDE Java's \\s (\\x00-\\x1f minus the five ws
    controls, and \\x7f) — class 4 routes the doc to the regex slow
    path because Python's isspace()/strip() disagree with Java about
    those bytes."""
    import numpy as np

    lut = np.full(256, 3, dtype=np.int8)
    for b in b" \t\n\x0b\x0c\r":
        lut[b] = 0
    for b in range(ord("A"), ord("Z") + 1):
        lut[b] = 1
    for b in range(ord("a"), ord("z") + 1):
        lut[b] = 1
    for b in range(ord("0"), ord("9") + 1):
        lut[b] = 2
    for b in range(0x00, 0x20):
        if b not in (0x09, 0x0A, 0x0B, 0x0C, 0x0D):
            lut[b] = 4
    lut[0x7F] = 4
    return lut


_TOKSTATS_LUT = None  # built lazily inside the worker

# Java-equivalent explicit classes (Python \s is Unicode-wide, Java's
# is ASCII): used only on the slow path (non-ASCII or control bytes).
import re as _re

_JWS = " \t\n\x0b\x0c\r"
_RX_JSPLIT = _re.compile("[" + _JWS + "]+")
_RX_JBPE = _re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]")


def _tokstats_slow(s: str) -> tuple[int, int]:
    # mirror size(split(trim(text), '\s+')) exactly: Spark trim strips
    # 0x20 ONLY; split with limit=-1 keeps leading/trailing empties
    t = s.strip(" ")
    ntok = len(_RX_JSPLIT.split(t))
    return ntok, len(_RX_JBPE.findall(s))


def _tokstats_fast(texts: list, cls) -> tuple[int, int]:
    """Vectorized (ntok_sum, nbpe_sum) over ASCII docs with no class-4
    bytes; ``cls`` is the caller's LUT classification of the
    ' '-joined batch (already built for the class-4 routing check —
    recomputing it here would double the kernel's dominant
    memory-bandwidth pass, review r8). Exactness argument, term by
    term:

    - split(trim(s), '\\s+') has size = (# maximal non-ws runs)
      + (1 if trim(s) starts with ws: the leading empty token)
      + (1 if trim(s) ends with ws: limit=-1 keeps the trailing empty)
      with the special case trim(s) == '' -> [''] -> 1.
      Runs are counted GLOBALLY over the ' '-joined buffer (the space
      separator closes every run at doc boundaries and space-trimming
      cannot change run counts); the two edge corrections and the
      empty case need per-doc head/tail inspection only.
    - the BPE-ish count per doc = letter-run starts + digit-run starts
      + count(class-3 bytes): tokens contain no ws, so counting runs
      over the raw text (ws breaks runs) equals the per-token sum the
      HOF computes — measured bit-equal, and pinned by parity tests.
    """
    import numpy as np

    def run_starts(mask):
        if len(mask) == 0:
            return 0
        st = np.empty(len(mask), dtype=bool)
        st[0] = mask[0]
        np.not_equal(mask[1:], mask[:-1], out=st[1:])
        st[1:] &= mask[1:]
        return int(np.count_nonzero(st))

    ntok = run_starts(cls != 0)
    nbpe = (
        run_starts(cls == 1)
        + run_starts(cls == 2)
        + int(np.count_nonzero(cls == 3))
    )
    for s in texts:  # per-doc head/tail corrections (C-speed str ops)
        t = s.strip(" ")
        if not t:
            ntok += 1  # split('') -> [''], one token
        else:
            if t[0] in _JWS:
                ntok += 1
            if t[-1] in _JWS:
                ntok += 1
    return ntok, nbpe


def _token_stats_hof(docs: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """The expression-form reference: tokenize once, size() +
    per-token regexp_count. Semantically definitive (the oracle SQL
    mirrors it) and the cheaper plan at small SF, where the Arrow
    kernel's Python-worker spin-up dominates (measured at sf0.1:
    kernel cold 8.6 s vs 1.6 s, warm equal)."""
    from nerd_spark.functions.text import bpe_ish_token_count, tokens

    staged = docs.select(group_col, text_col, tokens(text_col).alias("toks"))
    return staged.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks").cast("long")).alias("total_tokens"),
        F.sum(bpe_ish_token_count(text_col, toks=F.col("toks"))).alias(
            "total_bpe_ish"
        ),
    )


def token_stats(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(group, n_docs, total_tokens, total_bpe_ish) — the byte-LUT
    Arrow kernel form of the token-stats aggregation.

    The HOF form (tokenize once, size() + per-token regexp_count) is
    the semantic reference, but its cost is the JVM regex engine run
    per token; classifying BYTES through a 256-entry LUT and counting
    class-run starts does the same arithmetic at memory speed
    (measured at 160x, 800k docs: 2.5 -> 1.0 s warm; the whole-text
    regexp_count alternative measured 2x SLOWER than per-token — the
    regex engine is the cost either way, so the win needed a
    non-regex formulation, not a bigger regex). Unlike the cosine
    case (PLANS.md round-8 note) the Arrow transfer here is priced
    in and still wins: text must leave the JVM only once and the
    returned rows are one per (batch, group).

    Non-ASCII docs and docs with control bytes outside Java's \\s set
    take a per-doc Python-regex slow path with Java-equivalent
    explicit classes; parity with the HOF form on those inputs is
    pinned by adversarial tests (tests/test_sampling_keywords.py).

    SIZE-ADAPTIVE (the waist_checkpoint discipline): below
    ``spark.nerd.tokenStatsKernelMinBytes`` (default 32 MiB of source
    parquet) the HOF form runs instead — at small SF the kernel's
    Python-worker spin-up costs seconds while the regex saves
    milliseconds; the crossover is between sf0.1 (~3 MB, kernel cold
    8.6 vs 1.6 s, warm equal) and 80x (~250 MB, kernel 2.5x faster
    warm). Unknown input size assumes big: the scale path must never
    silently degrade.
    """
    import pandas as pd

    from nerd_spark.operators.dedup import _bytes_conf

    # Serve path: layout-materialized per-doc counts (sources/
    # layout.py, the lineitem-u4 discipline) — two long columns
    # replace the text scan entirely; group sums are bit-identical to
    # both query-time paths because the ingest expressions ARE the
    # HOF reference and kernel==HOF parity is pinned. The columns
    # travel with the rows (same parquet write), so there is no
    # sidecar staleness to gate on; transforms that rewrite text own
    # dropping them (the u4 contract).
    if (
        text_col == "text"
        and "n_tokens_pre" in docs.columns
        and "n_bpe_pre" in docs.columns
    ):
        return docs.groupBy(group_col).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens_pre").alias("total_tokens"),
            F.sum("n_bpe_pre").alias("total_bpe_ish"),
        )

    spark = docs.sparkSession
    min_bytes = _bytes_conf(spark, "spark.nerd.tokenStatsKernelMinBytes", 32 << 20)
    from nerd_spark.sources.fsutil import estimate_input_bytes

    est = estimate_input_bytes(docs)
    if est is not None and est < min_bytes:
        return _token_stats_hof(docs, group_col, text_col)

    def fn(batches):
        for pdf in batches:
            rows = []
            for grp, g in pdf.groupby(group_col, dropna=False):
                texts = [s for s in g[text_col] if s is not None]
                fast = [s for s in texts if s.isascii()]
                slow = [s for s in texts if not s.isascii()]
                ntok = nbpe = 0
                if fast:
                    import numpy as np

                    global _TOKSTATS_LUT
                    if _TOKSTATS_LUT is None:
                        _TOKSTATS_LUT = _tokstats_lut()
                    joined = " ".join(fast).encode("ascii")
                    cls = _TOKSTATS_LUT[np.frombuffer(joined, dtype=np.uint8)]
                    if np.any(cls == 4):  # rare: reroute ctrl-byte docs
                        keep = []
                        for s in fast:
                            if any(c in s for c in _CTRL_BYTES):
                                slow.append(s)
                            else:
                                keep.append(s)
                        fast = keep
                        joined = " ".join(fast).encode("ascii")
                        cls = _TOKSTATS_LUT[np.frombuffer(joined, dtype=np.uint8)]
                    if fast:
                        a, b = _tokstats_fast(fast, cls)
                        ntok += a
                        nbpe += b
                for s in slow:
                    a, b = _tokstats_slow(s)
                    ntok += a
                    nbpe += b
                grp = None if (isinstance(grp, float) and grp != grp) else grp
                if texts:
                    rows.append((grp, len(g), ntok, nbpe))
                else:  # all-NULL text: sum over nothing is NULL, not 0
                    rows.append((grp, len(g), None, None))
            yield pd.DataFrame(
                rows,
                columns=[group_col, "n_docs", "total_tokens", "total_bpe_ish"],
            )

    gt = docs.schema[group_col].dataType.simpleString()
    part = docs.select(group_col, text_col).mapInPandas(
        fn,
        f"{group_col} {gt}, n_docs long, total_tokens long, total_bpe_ish long",
    )
    return part.groupBy(group_col).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.sum("total_bpe_ish").alias("total_bpe_ish"),
    )


_CTRL_BYTES = [chr(b) for b in range(0x00, 0x20) if b not in (9, 10, 11, 12, 13)] + [
    "\x7f"
]
