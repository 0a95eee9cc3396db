"""Layout-time column statistics: per-(table, column) distinct-count
sidecars that the sketch operators' cardinality probes read instead of
re-scanning the corpus.

Why: the probe-routed sketches (top_frequent, heavy_hitters_by, the
exact-quantile histogram gate) each open with one map-only
approx_count_distinct pass to decide plain-vs-screen or
histogram-vs-bracket. The routing is right, but the probe itself
re-scans the corpus PER CALL — at the 320x stress point that is ~10 s
of cold scan per sketch query answering a question whose answer is a
property of the TABLE, not the query. The reference keeps exactly this
kind of table-level metadata fresh out-of-band (cron-refreshed meta
info, scripts/update_db_meta_info.js; range-encoded index stats at
write time) — here the analogue is a JSON sidecar written once at
layout/ingest time from the same one-pass HLL aggregate, then read by
every probe for the cost of a filesystem stat.

Safety model — stats can only ever cost PERFORMANCE, never
correctness:

- Every routed path is exact (the sketches' contract); a wrong
  cardinality only picks the slower exact plan or over-sizes a
  shuffle.
- The sidecar is pinned to a directory signature (file count + total
  bytes, :func:`fsutil.dir_signature`): any append/compact/overwrite
  invalidates it and the caller falls back to the scanning probe.
- A probed column must exist in the sidecar WITH a matching data
  type; renamed/derived columns miss and fall back.
- The recorded count is table-level. For a row-filtered subset it is
  an UPPER bound on the subset's distinct count, so a "bounded"
  certificate stays valid; an over-bound verdict may conservatively
  route a small filtered subset to the screen/bracket path — exact
  either way. `spark.nerd.colstatsProbe=off` disables reads entirely.

At 100 TB: the write is one map-side HLL aggregate folded into the
layout/ingest job (no extra shuffle — partial aggregation of HLL
registers); reads are O(1) driver-side metadata. Probes on raw,
never-laid-out directories keep today's scanning behavior.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nerd_spark.sources import fsutil

STATS_NAME = "_nerd_colstats.json"
_VERSION = 1

# payload cache keyed by sidecar path; entries carry the sidecar mtime
# they were read at, so an overwritten sidecar is re-read.
_CACHE: dict[str, tuple[float, dict]] = {}


def stats_path(table_dir: str) -> str:
    return posixpath.join(table_dir.rstrip("/"), STATS_NAME)


def write_column_stats(
    spark: SparkSession,
    table_dir: str,
    columns: list[str],
    pairs: list[tuple[str, str]] | tuple = (),
    rsd: float = 0.05,
) -> dict:
    """Compute approx-distinct counts for ``columns`` and ``pairs`` in
    ONE map-side-combined aggregate over the table and commit them as
    a sidecar pinned to the directory's current signature.

    Call AFTER the table's data is final for the write (the layout
    rewrite, an ingest batch's close): the signature is sampled before
    the aggregate, so a concurrent write invalidates the sidecar
    rather than mis-pinning it. Commit is write-aside + atomic rename.
    """
    sig = fsutil.dir_signature(spark, table_dir)
    df = spark.read.parquet(table_dir)
    aggs = []
    col_types = {}
    for c in columns:
        col_types[c] = df.schema[c].dataType.simpleString()
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"c{len(aggs)}"))
    for g, k in pairs:
        aggs.append(
            F.approx_count_distinct(F.struct(g, k), rsd).alias(
                f"c{len(aggs)}"
            )
        )
    row = df.agg(*aggs).first()
    payload = {
        "version": _VERSION,
        "rsd": rsd,
        "signature": list(sig),
        "columns": {
            c: {"nd": int(row[i]), "dtype": col_types[c]}
            for i, c in enumerate(columns)
        },
        "pairs": [
            {
                "cols": [g, k],
                "nd": int(row[len(columns) + j]),
                "dtypes": [
                    df.schema[g].dataType.simpleString(),
                    df.schema[k].dataType.simpleString(),
                ],
            }
            for j, (g, k) in enumerate(pairs)
        ],
    }
    final = stats_path(table_dir)
    tmp = final + ".tmp"
    # the sidecar lives INSIDE the data dir, and creating/renaming it
    # bumps the dir's mtime — which is the staleness clock every serve
    # gate compares its commit marker against. A stats refresh changes
    # no data, so restore the clock afterwards (single-writer
    # contract, same as the docstring's "data is final" requirement);
    # a failed restore only costs conservative raw fallbacks.
    try:
        dir_mtime = fsutil.mtime(spark, table_dir)
    except Exception:
        dir_mtime = None
    fsutil.write_text(spark, tmp, json.dumps(payload))
    fsutil.delete(spark, final)
    fsutil.rename(spark, tmp, final)
    if dir_mtime is not None:
        try:
            # Guard the restore: if a DATA write landed between the
            # signature capture and here (a single-writer-contract
            # violation, or an aggregate that outlived a concurrent
            # batch), restoring the captured mtime would mask that
            # write's clock bump — and every serve gate
            # (gate-mtime >= data-dir-mtime) would report stale
            # summaries as FRESH, serving wrong results instead of
            # the conservative raw fallback. The discriminator is the
            # dir signature, not the mtime (our own sidecar ops bump
            # the mtime too, but hidden `_`/`.` files are excluded
            # from the signature while any data write changes it):
            # signature changed -> skip the restore, leaving the data
            # write's bump visible so the gates park on raw — which
            # is also correct for THIS sidecar, since it is pinned to
            # the stale signature and readers will reject it.
            if fsutil.dir_signature(spark, table_dir) == sig:
                fsutil.set_mtime(spark, table_dir, dir_mtime)
        except Exception:
            pass
    _CACHE.pop(final, None)
    return payload


def _load(spark: SparkSession, path: str) -> dict | None:
    try:
        mt = fsutil.mtime(spark, path)
    except Exception:
        return None
    hit = _CACHE.get(path)
    if hit is not None and hit[0] == mt:
        return hit[1]
    text = fsutil.read_text(spark, path)
    if text is None:
        return None
    try:
        payload = json.loads(text)
    except ValueError:
        return None
    if payload.get("version") != _VERSION:
        return None
    _CACHE[path] = (mt, payload)
    return payload


def _locate(spark: SparkSession, files: list[str]) -> tuple[str, str] | None:
    """Find the sidecar governing ALL of a scan's input files: walk up
    from the first file's directory (2 levels — flat tables and one
    partition-column layouts like cid=<n>/), require every other file
    to live under the located table dir (a union of two tables must
    not borrow one table's stats)."""
    d = posixpath.dirname(files[0])
    for _ in range(2):
        sp = posixpath.join(d, STATS_NAME)
        if fsutil.exists(spark, sp):
            prefix = d.rstrip("/") + "/"
            if all(f.startswith(prefix) for f in files):
                return d, sp
            return None
        d = posixpath.dirname(d)
        if not d or d == "/":
            break
    return None


def distinct_upper_bound(df: DataFrame, cols: list[str]) -> int | None:
    """An upper bound on the distinct count of ``cols`` (1 = column,
    2 = pair) over ``df``'s rows, served from a fresh layout sidecar —
    or None, meaning "no trustworthy stat, run the scanning probe".

    A direct pair stat is preferred; absent one, the PRODUCT of the
    single-column counts still upper-bounds the pair count, so it can
    certify a bounded domain (never the reverse). All verdicts are
    table-level: see the module safety model.
    """
    spark = df.sparkSession
    if (
        spark.conf.get("spark.nerd.colstatsProbe", "on").lower()
        in ("off", "false", "0")
    ):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    loc = _locate(spark, list(files))
    if loc is None:
        return None
    table_dir, sp = loc
    payload = _load(spark, sp)
    if payload is None:
        return None
    if tuple(payload.get("signature", ())) != fsutil.dir_signature(
        spark, table_dir
    ):
        return None
    want = [df.schema[c].dataType.simpleString() for c in cols]
    singles = payload.get("columns", {})
    if len(cols) == 1:
        ent = singles.get(cols[0])
        if ent is None or ent.get("dtype") != want[0]:
            return None
        return int(ent["nd"])
    if len(cols) == 2:
        for ent in payload.get("pairs", []):
            if ent.get("cols") == list(cols) and ent.get("dtypes") == want:
                return int(ent["nd"])
        prod = 1
        for c, w in zip(cols, want):
            ent = singles.get(c)
            if ent is None or ent.get("dtype") != w:
                return None
            prod *= int(ent["nd"])
        return prod
    return None


def maybe_refresh_column_stats(
    spark: SparkSession,
    table_dir: str,
    columns: list[str],
    pairs: list[tuple[str, str]] | tuple = (),
    growth: float = 1.25,
) -> bool:
    """Amortized sidecar refresh for continuously-ingested tables:
    every append invalidates the signature (probes then fall back to
    scanning), but re-aggregating per micro-batch would cost one
    corpus pass per batch. Refresh only when the table has grown past
    ``growth``x the bytes the sidecar was computed at (or the sidecar
    is missing/unreadable): O(log) full passes over the table's
    lifetime — the epoch-compaction cadence discipline — while the
    stat's routing verdict stays within the margin the probes already
    apply. Between refreshes probes fall back to scanning, which is
    only ever a performance cost (module safety model). Returns True
    when a refresh ran."""
    sp = stats_path(table_dir)
    payload = _load(spark, sp)
    if payload is not None:
        old_n, old_bytes = payload.get("signature", (0, 0))
        _, cur_bytes = fsutil.dir_signature(spark, table_dir)
        if cur_bytes <= old_bytes * growth:
            return False
    write_column_stats(spark, table_dir, columns, pairs)
    return True
