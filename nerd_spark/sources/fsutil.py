"""Filesystem access for driver-side state management, routed through
the JVM Hadoop FileSystem API instead of python's os module.

Why: derived-state listings (streaming epoch dirs, summary-table
commit markers, retention pruning) were os.listdir/os.path based —
correct single-node, silently wrong the moment a state path moves to
HDFS/S3 (os.path.isdir('hdfs://...') is False, so every tick would
"start from empty state" with no error). Every path here resolves
through `Path.getFileSystem(hadoopConf)`, so local paths, file://
URIs, and any deployed scheme (hdfs://, s3a://) behave identically —
the same resolution Spark's own readers/writers use.

All calls are driver-side metadata operations bounded by state-dir
entry counts (epochs, date partitions), never data-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry basenames of a directory; [] when the path is
    missing or not a directory (matching the defensive callers)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """FileSystem.rename — atomic dir/file move on HDFS and local FS
    (the commit step of write-aside-then-swap maintenance)."""
    fs, s = _fs(spark, src)
    _, d = _fs(spark, dst)
    return bool(fs.rename(s, d))


def swap_partition_dirs(
    spark: SparkSession, staging_path: str, table_path: str, prefix: str
) -> list[str]:
    """Move every ``prefix``-named child of the staging dir into the
    live table (delete-then-rename per dir, each atomic on HDFS/posix)
    with ONE FileSystem resolution for the whole loop — the per-call
    wrappers above cost py4j round-trips each, and a commit's swap
    window should be as short as possible (measured: the wrapper-based
    loop added ~1s per fold batch at 60 date partitions). Staging and
    table are sibling paths on the same filesystem. Returns the moved
    child names; raises IOError on the first failed delete/rename (the
    remaining staging copies stay intact for recovery)."""
    jvm = spark._jvm
    fs, sp = _fs(spark, staging_path)
    tp = jvm.org.apache.hadoop.fs.Path(table_path)
    moved: list[str] = []
    for status in fs.listStatus(sp):
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        dest = jvm.org.apache.hadoop.fs.Path(tp, name)
        if fs.exists(dest) and not fs.delete(dest, True):
            raise IOError(
                f"swap_partition_dirs: failed to remove old partition: {dest}"
            )
        if not fs.rename(status.getPath(), dest):
            raise IOError(
                f"swap_partition_dirs: failed to swap in partition: {dest}"
            )
        moved.append(name)
    return moved


def mkdirs(spark: SparkSession, path: str) -> bool:
    """FileSystem.mkdirs — create a directory (and parents). Needed
    before a partition-dir rename: Hadoop's rename fails (returns
    false) when the destination's parent does not exist."""
    fs, p = _fs(spark, path)
    return bool(fs.mkdirs(p))


def touch(spark: SparkSession, path: str) -> None:
    """Create (or truncate) a zero-byte marker file — the _SUCCESS
    commit-marker pattern."""
    fs, p = _fs(spark, path)
    fs.create(p, True).close()


def size(spark: SparkSession, path: str) -> int:
    """File length in bytes (one FS stat — works on any Hadoop FS)."""
    fs, p = _fs(spark, path)
    return int(fs.getFileStatus(p).getLen())


def mtime(spark: SparkSession, path: str) -> float:
    """Modification time in epoch seconds (Hadoop reports ms)."""
    fs, p = _fs(spark, path)
    return fs.getFileStatus(p).getModificationTime() / 1000.0


def set_mtime(spark: SparkSession, path: str, mtime_sec: float) -> None:
    """FileSystem.setTimes — restore a directory's modification time
    after writing a METADATA sidecar into it. The serve gates compare
    their commit markers against the data dir's mtime, so a sidecar
    refresh that bumps it would silently park every serve on the raw
    fallback until the next fold (colstats.write_column_stats is the
    one such writer). Only valid under the single-writer contract:
    restoring over a concurrent DATA write would mask it."""
    fs, p = _fs(spark, path)
    fs.setTimes(p, int(mtime_sec * 1000), -1)


def estimate_input_bytes(df) -> int | None:
    """Estimated source bytes behind a DataFrame's file scan, from a
    bounded sample of its input files (<= 8 FS stats regardless of
    file count) — the cheap prior the size-gated operators use to
    choose a strategy BEFORE paying any Spark job (token_stats'
    kernel-vs-HOF gate, the quantile histogram-vs-bracket gate).
    Returns None when the frame has no file inputs (in-memory test
    frames, post-shuffle views). The unknown-size policy is PER
    CALLER, chosen by which failure mode is cheap at that seam:
    _hist_or_none treats None as small (a wasted small-source
    aggregation), while token_stats and the dedup index serve gate
    treat None as large/serve (their small-path fallbacks are the
    expensive ones). New call sites must pick deliberately."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    n = len(files)
    sample = files[:: max(1, n // 8)][:8]
    try:
        sizes = [size(spark, f) for f in sample]
    except Exception:
        return None
    return int(sum(sizes) / len(sizes) * n)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small driver-side text artifact (sidecar JSON) through
    the Hadoop FS API — same any-scheme guarantee as the rest of this
    module. Overwrites. Callers wanting atomicity write a temp name
    and :func:`rename` (atomic on HDFS and local FS)."""
    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Atomic variant of :func:`write_text` for COMMIT-POINT sidecars
    (the staged-fold manifest): the text lands under a temp name and is
    :func:`rename`\\ d into place, so a reader can only ever observe the
    file absent or complete — never a torn prefix. A plain write_text
    commit point would let a crash mid-write leave a partial JSON that
    a recovery path might mistake for a reached commit. The temp name
    keeps the sidecar's hidden `_`/`.` prefix so dir_signature and
    partition discovery never see it."""
    base = os.path.basename(path)
    prefixed = base if base[:1] in ("_", ".") else "." + base
    tmp = os.path.join(os.path.dirname(path), prefixed + ".inprogress")
    write_text(spark, tmp, text)
    delete(spark, path)
    if not rename(spark, tmp, path):
        raise IOError(f"write_text_atomic: rename failed: {tmp} -> {path}")


def read_text(spark: SparkSession, path: str) -> str | None:
    """Read a small text artifact; None when missing. Bounded by
    sidecar size (KBs) — never data-sized."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def dir_signature(spark: SparkSession, table_dir: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) over every non-hidden file under a
    table directory, recursively — the freshness fingerprint sidecar
    stats are pinned to. Any append/compact/overwrite changes it, so a
    stale sidecar can never be trusted. Hidden entries (`_*`, `.*` —
    markers, sidecars, CRCs) are excluded at EVERY path component, so
    writing the sidecar itself does not perturb the signature. Pure FS
    metadata: one recursive listing, no data reads."""
    fs, p = _fs(spark, table_dir)
    if not fs.exists(p):
        return (0, 0)
    n = 0
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        fp = st.getPath()
        hidden = False
        # walk path components up to (excluding) table_dir
        comp = fp
        while comp is not None and str(comp) != str(p):
            name = comp.getName()
            if name.startswith("_") or name.startswith("."):
                hidden = True
                break
            comp = comp.getParent()
        if hidden:
            continue
        n += 1
        total += int(st.getLen())
    return (n, total)
