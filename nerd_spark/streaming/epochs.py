"""Base-epoch roll-up for per-epoch additive state tables.

The hh_stream / quantile_stream state layout (one parquet dir per
micro-batch epoch) grows its serving union one directory per batch.
Both serving queries re-SUM per key, and their state rows are
ADDITIVE (term tf counts, value-histogram counts), so any prefix of
epochs can be folded into one base epoch without changing any serve —
the day-roll discipline of the window summary table, applied to
stream state. At 100 TB horizons this bounds the union width: serve
cost stays O(base + recent epochs), not O(all batches ever).

Crash-safe protocol (write-aside, self-healing resume — the
ivfpq_compact discipline):

1. write the folded state to ``epoch=<max>.new`` (parquet emits
   _SUCCESS last, so a torn write is self-identifying);
2. delete the source epoch dirs (serving skips any dir without
   _SUCCESS mid-delete; a serve during this window transiently
   UNDERCOUNTS — never double-counts, because the base is not yet
   visible);
3. rename ``epoch=<max>.new`` -> ``epoch=<max>``.

A crash anywhere leaves all data recoverable: before (2) the source
epochs are intact (an incomplete ``.new`` has no _SUCCESS and is
simply rewritten); after (2) the complete ``.new`` holds everything
and the next :func:`compact_epochs` call finishes the rename before
doing anything else. The base reuses the HIGHEST compacted epoch id:
stream epoch ids only grow (checkpointed), and batch ids at or below
the base are by definition committed, so no replay can target it.

Only compact epochs the stream's checkpoint has committed — i.e. run
this from the maintenance side, not inside foreachBatch.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nerd_spark.streaming.hh_stream import _epochs


def _resume_pending(spark, state_dir: str) -> None:
    """Finish a compaction that crashed between delete and rename:
    a COMPLETE (_SUCCESS-bearing) ``epoch=<n>.new`` whose target dir
    is gone is the committed state — land it."""
    from nerd_spark.sources import fsutil

    for name in fsutil.list_names(spark, state_dir):
        if not name.endswith(".new"):
            continue
        target = name[: -len(".new")]
        src = os.path.join(state_dir, name)
        if not fsutil.exists(spark, os.path.join(src, "_SUCCESS")):
            continue  # torn write: the sources are still intact
        if not fsutil.exists(spark, os.path.join(state_dir, target)):
            fsutil.rename(spark, src, os.path.join(state_dir, target))


def compact_epochs(
    spark,
    state_dir: str,
    count_col: str,
    keep_recent: int = 0,
) -> int:
    """Fold committed epochs into one base epoch; returns how many
    source epochs were folded (0 = nothing to do). ``count_col`` is
    the additive column (hh state: ``tf``; quantile state: ``cnt``);
    every other column is part of the key. ``keep_recent`` leaves the
    newest N epochs unfolded (cheap incremental serves often touch
    only recent epochs)."""
    from nerd_spark.sources import fsutil

    if not fsutil.exists(spark, state_dir):
        return 0
    _resume_pending(spark, state_dir)
    eps = _epochs(spark, state_dir)
    if keep_recent:
        eps = eps[: -keep_recent or None]
    if len(eps) < 2:
        return 0
    base = eps[-1]
    paths = [os.path.join(state_dir, f"epoch={e}") for e in eps]
    pairs = (
        spark.read.option("basePath", state_dir).parquet(*paths).drop("epoch")
    )
    keys = [c for c in pairs.columns if c != count_col]
    merged = pairs.groupBy(*keys).agg(F.sum(count_col).alias(count_col))
    aside = os.path.join(state_dir, f"epoch={base}.new")
    merged.write.mode("overwrite").parquet(aside)
    for e in eps:
        fsutil.delete(spark, os.path.join(state_dir, f"epoch={e}"), recursive=True)
    fsutil.rename(spark, aside, os.path.join(state_dir, f"epoch={base}"))
    return len(eps)
