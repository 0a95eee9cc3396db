#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop data source (full
computation, no driver collect). Timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Round-4/5 additions, timed as their own group so the HEADLINE list
# stays comparable round-over-round. corpus_curation_v2 is the
# round-5 flagship: the whole curation funnel (quality gate ->
# decontamination -> LSH near-dup clusters -> mixture -> split/shard)
# as one number.
EXTENDED = [
    "mixture_sample",
    "shard_assign",
    "tfidf_top_terms",
    "dedup_incremental",
    "quality_model_filter",
    "lm_unigram_logprob",
    "dedup_best_of_cluster",
    "corpus_curation_v2",
    "text_span_dedup",
    "corpus_curation_v3",
    # round-8 sketch family (exact screen+verify algorithms)
    "hh_event_users",
    "hh_terms",
    "quantile_event_values",
    "quantile_by_event_type",
    "hh_by_event_type",
    "corpus_stats_card",
    "top_frequent_users",
    "lm_bigram_logprob",
    # round-10: the linear-in-clique-depth cluster path (r9 verdict #1)
    "dedup_clusters_scalable",
    # round-10 session 2: ordered funnel / cohort retention (per-user
    # scalar aggregations) and asymmetric containment dedup
    "funnel_stages",
    "cohort_retention",
    "dedup_containment",
    # round-11: curation funnel + containment subset-copy stage
    "corpus_curation_v4",
    # round-13: absolute-count heavy keys — the scale-stable hh
    # bindings whose served answers stay NON-EMPTY at bench scale
    # (the fractional hh thresholds go empty above sf0.01, so their
    # rows above time empty answers; these are the load-bearing
    # serve measurements for the keycount family)
    "hh_users_min_count",
    "hh_by_type_min_count",
]

# Replica-scale ratio set (r13 verdict #2): the sf0.1 headline is
# job-launch floors end to end (8-vs-32-core scaling ratios ≈ 1 on
# every query; serve answers are file reads), so sf0.1 walls cannot
# adjudicate optimization work. The committed row therefore ALSO
# carries engine/DuckDB ratios measured on an N-fold replica of the
# input (bench_scale.replicate — key-shifted, text-rotated, built
# INSIDE this run from the raw parquet inputs and layout-optimized
# the same way; build cost reported, nothing persists across runs).
# The set is the headline plus the dedup/curation tail whose cost is
# data-dominated at replica scale.
REPLICA_EXTRA = [
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_incremental",
    "text_span_dedup",
    "dedup_clusters_scalable",
    "corpus_curation_v3",
    "corpus_curation_v4",
]

# Representative cut across operator families; excludes the
# deliberately quadratic-ish jaccard candidate path (minhash LSH is
# the scale-path dedup entry).
HEADLINE = [
    "q1_pricing_summary",
    "a1_daily_rollup",
    "a2_window_totals",
    "a3_ewma",
    "a7_total_reputation",
    "j1_equi_join",
    "j2_enrichment_chain",
    "j5_asof_join",
    "a16_rollup_revenue",
    "w1_topk",
    "w4_last_n_per_key",
    "op_merge_snapshot",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_ivf_indexed",
    "text_token_stats",
    "multimodal_bytes",
]


def _canary_burn(n: int) -> int:
    """Module-level so the canary pool's fork children can run it."""
    x = 0
    for i in range(n):
        x += i * i
    return x


def _cpu_canary() -> float:
    """Seconds for a fixed single-thread workload (hash spin + numpy
    matmul). Guest loadavg cannot see HOST contention on a shared VM —
    two back-to-back runs of this bench have measured uniformly 2.3x
    apart at guest-idle — so every record carries this calibration
    number: compare bench rows only after checking their canaries
    agree (~±10%). Nominal on a quiet host here: ~0.13 s."""
    import hashlib

    import numpy as np

    t0 = time.perf_counter()
    h = b"x" * 64
    for _ in range(60_000):
        h = hashlib.md5(h).digest()
    a = np.random.default_rng(7).random((384, 384))
    for _ in range(12):
        a = a @ a % 1.0
    return round(time.perf_counter() - t0, 4)


def _cpu_canary_par() -> float:
    """Seconds for a fixed 16-process CPU workload — the PARALLEL
    throughput calibration the single-thread canary misses: this host
    has measured a nominal single-thread canary while delivering only
    ~10 of 32 effective cores to a process pool (and JVM stage times
    inflated 2-4x in exactly those windows). Multi-thread Spark stages
    track THIS number, not the single-thread one. Fully-delivered 32
    cores put it near 16/32 x the per-task time (~0.15 s); ~0.5 s
    means half the cores are gone. Compare rows only when BOTH
    canaries agree."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    ctx = mp.get_context("fork")
    with ctx.Pool(16) as p:
        p.map(_canary_burn, [6_000_000] * 16)
    return round(time.perf_counter() - t0, 4)


def _canary_gate() -> tuple[str, float, float]:
    """Refuse to time on degraded silicon (r11 verdict #4: the
    committed r11 row came from a ~5.7x-degraded window and poisoned
    the round-over-round diff). Waits until BOTH canaries land within
    tolerance of their nominals, else proceeds with a loud DEGRADED
    verdict a comparator script can read from run_meta.canary_gate —
    cross-window ratios from such a row are not comparable."""
    nom_s = float(os.environ.get("SPARK_GRAFT_BENCH_CANARY_NOM_S", "0.13"))
    nom_p = float(os.environ.get("SPARK_GRAFT_BENCH_CANARY_NOM_P", "0.15"))
    tol = float(os.environ.get("SPARK_GRAFT_BENCH_CANARY_TOL", "0.25"))
    # bounded wait: the stamped verdict is the essential part (a
    # degraded row can no longer pass as comparable); the wait is
    # best-effort and must not eat the driver's round budget on a
    # host that stays contended for hours (measured: this host's
    # parallel canary floored ~2-3x nominal for a whole session)
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_CANARYWAIT", "300"))
    waited = 0.0
    while True:
        s, p = _cpu_canary(), _cpu_canary_par()
        ok = s <= nom_s * (1 + tol) and p <= nom_p * (1 + tol)
        if ok or waited >= budget:
            verdict = (
                "ok"
                if ok
                else (
                    f"DEGRADED: single={s:.3f} (nominal {nom_s}) "
                    f"par={p:.3f} (nominal {nom_p}) after {int(waited)}s "
                    "wait; cross-window ratios not comparable"
                )
            )
            return verdict, s, p
        time.sleep(15)
        waited += 15


def main() -> None:
    import tempfile

    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import get_spark, read_table
    from nerd_spark.sources.layout import optimize_layout

    # Load sampled BEFORE Spark starts: this is the number that says
    # whether the machine was busy going in. The end-of-run sample
    # (loadavg_1m_end) mostly reflects the bench's own 32 threads.
    # Gate (r7 verdict #2: the committed r7 bench started at loadavg
    # 6.2 and understated the round by ~25%): wait for the machine to
    # go idle before timing; if it never does within the budget,
    # proceed but mark the record loudly so a reader discounts it.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAXLOAD", "2.0"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOADWAIT", "300"))
    waited = 0.0
    while os.getloadavg()[0] > max_load and waited < wait_budget:
        time.sleep(10)
        waited += 10
    load_start = os.getloadavg()
    load_gate = (
        "ok"
        if load_start[0] <= max_load
        else f"FAILED: started at loadavg {load_start[0]:.2f} after {int(waited)}s wait"
    )
    canary_gate, canary_pre_s, canary_pre_p = _canary_gate()

    spark = get_spark(app_name="nerd_spark_bench")
    # warm the JVM/session so timings aren't charged for codegen bring-up
    spark.range(1000).selectExpr("sum(id)").collect()

    # Ingest-time layout optimization (compaction/clustering): the
    # provided tables are single-row-group files, capping every scan
    # at one core. Rewriting into sorted multi-file parquet is what a
    # real deployment's ingest does; the one-time cost is reported
    # separately. Set SPARK_GRAFT_BENCH_LAYOUT=raw to benchmark
    # against the unoptimized files instead.
    data_dir = SF_DIR
    layout_sec = 0.0
    serve_status: list[dict] = []
    if os.environ.get("SPARK_GRAFT_BENCH_LAYOUT", "optimized") != "raw":
        data_dir = tempfile.mkdtemp(prefix="nerd_spark_layout_")
        t0 = time.perf_counter()
        optimize_layout(spark, SF_DIR, data_dir)
        layout_sec = round(time.perf_counter() - t0, 3)
        # Serve-status precondition (r12 verdict #4): a regression of
        # the colstats-staleness-clock class silently parks every
        # serve on the raw fallback — the bench would then measure raw
        # paths while reporting serve-tier numbers. Fail LOUDLY
        # instead: every serve table the layout build created must be
        # committed (gated), fresh against the events mtime clock, and
        # not mid-commit (no staging sibling). Absent tables are fine —
        # raw fallback is the designed degradation for dirs that never
        # built them.
        from nerd_spark.sources.layout import serve_table_status

        serve_status = serve_table_status(spark, data_dir)
        bad = [
            r["table"]
            for r in serve_status
            if r["present"]
            and not (r["gated"] and r["fresh"] and not r["staging"])
        ]
        if bad:
            raise RuntimeError(
                "bench precondition failed: serve tables stale/orphaned "
                f"after layout build: {bad}; every serve-tier timing "
                "below would silently measure the raw fallback"
            )

    for name in (
        "lineitem orders customer nation region events documents embeddings".split()
    ):
        read_table(spark, data_dir, name).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name]
        t0 = time.perf_counter()
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Warm passes: steady-state (codegen/plan cache warm) per-query
    # time, MEDIAN OF 3 runs per query — a single pass is hostage to
    # whatever else the machine is doing (the r5 snapshot recorded a
    # phantom ~40% "regression" that was pure machine load). The
    # first-pass headline_total stays single-pass for round-over-round
    # comparability; run metadata below lets a reader judge noise.
    #
    # The DuckDB comparator runs INTERLEAVED inside the same passes
    # (r12 verdict #3): committed wall-times from two consecutive
    # degraded host windows proved non-comparable across rounds, but a
    # same-window engine/duck ratio cancels the host term — so the
    # committed row now carries per-query ratios a future round can
    # diff regardless of host health. Same data dir, same oracle SQL
    # the correctness gate runs.
    import statistics

    from nerd_spark.queries import ORACLE

    try:
        from bench_duckdb import duck_connect

        duck_con = duck_connect(data_dir)
    except Exception:
        duck_con = None  # comparator optional: never fail the bench
    warm_runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    duck_runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            fn = REGISTRY[name]
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            warm_runs[name].append(time.perf_counter() - t0)
            if duck_con is not None and name in ORACLE:
                t0 = time.perf_counter()
                duck_con.execute(ORACLE[name]).fetchall()
                duck_runs[name].append(time.perf_counter() - t0)
    warm = {
        name: round(statistics.median(runs), 3)
        for name, runs in warm_runs.items()
    }
    comparator = {
        name: round(statistics.median(runs), 3)
        for name, runs in duck_runs.items()
        if runs
    }
    queries_ratio = {
        name: round(warm[name] / comparator[name], 3)
        for name in comparator
        if comparator[name] > 0
    }

    extended: dict[str, float] = {}
    for name in EXTENDED:
        fn = REGISTRY[name]
        t0 = time.perf_counter()
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        extended[name] = round(time.perf_counter() - t0, 3)

    # Replica-scale ratio block (r13 verdict #2): build an N-fold
    # replica dir IN THIS RUN (replicate + the same layout pass —
    # both timed and reported), then one interleaved engine/DuckDB
    # pass over HEADLINE + REPLICA_EXTRA. At this scale the queries
    # are data-dominated, so the per-query ratio is the
    # host-independent number optimization rounds diff; sf0.1 ratios
    # above stay for continuity but are floor-arithmetic.
    # SPARK_GRAFT_BENCH_REPLICA=0 disables; --replica N overrides.
    replica_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICA", "16"))
    if "--replica" in sys.argv:
        replica_n = int(sys.argv[sys.argv.index("--replica") + 1])
    replica_out: dict = {}
    if replica_n > 1:
        # Outside every timed region: drop Python handles from the
        # sf0.1 sections so their tie-based cache unpersists fire
        # before the replica block fills the same local-mode heap —
        # a 160x run OOM'd a broadcast build on accumulated caches
        # while every replica query runs clean in a fresh session.
        import gc

        gc.collect()
        from bench_duckdb import duck_connect as _rep_duck_connect
        from bench_scale import replicate
        from nerd_spark.sources.layout import serve_table_status

        rep_raw = tempfile.mkdtemp(prefix=f"nerd_bench_rep{replica_n}_raw_")
        t0 = time.perf_counter()
        replicate(spark, SF_DIR, rep_raw, replica_n)
        rep_build_sec = round(time.perf_counter() - t0, 3)
        rep_dir = tempfile.mkdtemp(prefix=f"nerd_bench_rep{replica_n}_")
        t0 = time.perf_counter()
        optimize_layout(spark, rep_raw, rep_dir, scale=replica_n)
        rep_layout_sec = round(time.perf_counter() - t0, 3)
        rep_serve = serve_table_status(spark, rep_dir)
        bad = [
            r["table"]
            for r in rep_serve
            if r["present"]
            and not (r["gated"] and r["fresh"] and not r["staging"])
        ]
        if bad:
            raise RuntimeError(
                f"replica bench precondition failed: stale serve tables {bad}"
            )
        try:
            rep_duck = _rep_duck_connect(rep_dir)
        except Exception:
            rep_duck = None
        # The comparator gets a per-query budget: several dedup/curation
        # oracles are quadratic-ish SQL that DuckDB chews on for many
        # minutes at replica scale (that asymmetry IS the design point —
        # the engine's banded/star algorithms stay near-linear), and an
        # uncapped oracle would eat the driver's whole bench window.
        # A capped query records the budget as its comparator time, so
        # its reported ratio is an UPPER bound (engine looks worse than
        # truth, never better) and lands in comparator_replica_capped.
        duck_budget = float(
            os.environ.get("SPARK_GRAFT_BENCH_REPLICA_DUCK_BUDGET", "60")
        )
        rep_walls: dict[str, float] = {}
        rep_duckt: dict[str, float] = {}
        rep_capped: list[str] = []
        for name in HEADLINE + REPLICA_EXTRA:
            fn = REGISTRY[name]
            spark.sparkContext.setJobDescription(f"replica{replica_n}x:{name}")
            t0 = time.perf_counter()
            fn(spark, rep_dir).write.format("noop").mode("overwrite").save()
            rep_walls[name] = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            if rep_duck is not None and name in ORACLE:
                import threading

                done = threading.Event()

                def _watchdog(con=rep_duck, ev=done):
                    if not ev.wait(duck_budget):
                        con.interrupt()

                wd = threading.Thread(target=_watchdog, daemon=True)
                t0 = time.perf_counter()
                wd.start()
                try:
                    rep_duck.execute(ORACLE[name]).fetchall()
                    rep_duckt[name] = round(time.perf_counter() - t0, 3)
                except Exception:
                    rep_duckt[name] = round(duck_budget, 3)
                    rep_capped.append(name)
                finally:
                    done.set()
                    wd.join()
        replica_out = {
            "replica_factor": replica_n,
            "replica_build_sec": rep_build_sec,
            "replica_layout_sec": rep_layout_sec,
            "replica_serve_tables_fresh": sum(
                1 for r in rep_serve if r["present"]
            ),
            "queries_replica": rep_walls,
            "comparator_replica": rep_duckt,
            "comparator_replica_capped": rep_capped,
            "queries_ratio_replica": {
                n: round(rep_walls[n] / rep_duckt[n], 3)
                for n in rep_duckt
                if rep_duckt[n] > 0
            },
            "ratio_overall_replica": round(
                sum(rep_walls[n] for n in rep_duckt)
                / max(sum(rep_duckt.values()), 1e-9),
                3,
            )
            if rep_duckt
            else None,
        }
        import shutil

        shutil.rmtree(rep_raw, ignore_errors=True)
        shutil.rmtree(rep_dir, ignore_errors=True)

    # Per-stage breakdown of the curation flagship so its one number
    # localizes regressions (quality gate vs LSH vs clustering ...).
    from nerd_spark.queries.dataprep import (
        corpus_curation_v2_stages,
        corpus_curation_v3_stages,
    )

    curation_stages = corpus_curation_v2_stages(spark, data_dir)
    curation_v3_stages = corpus_curation_v3_stages(spark, data_dir)

    def _testdata_fingerprint() -> str:
        """Stable hash of the input dir's (name, size) listing — a
        bench row is only comparable to rows with the same data."""
        import hashlib

        h = hashlib.md5()
        for root, dirs, files in sorted(os.walk(SF_DIR)):
            dirs.sort()
            for f in sorted(files):
                p = os.path.join(root, f)
                h.update(f"{os.path.relpath(p, SF_DIR)}:{os.path.getsize(p)};".encode())
        return h.hexdigest()[:16]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "layout_optimization_sec": layout_sec,
        "warm_total": round(sum(warm.values()), 3),
        "warm_queries": warm,
        "warm_passes": 3,
        # interleaved same-window comparator: these three fields are
        # the round-over-round comparable artifact; the wall-times
        # above are only comparable between same-canary windows
        "comparator_total": round(sum(comparator.values()), 3),
        "comparator_queries": comparator,
        "queries_ratio": queries_ratio,
        "ratio_overall": round(
            sum(warm[n] for n in comparator)
            / max(sum(comparator.values()), 1e-9),
            3,
        )
        if comparator
        else None,
        "serve_tables_fresh": sum(
            1 for r in serve_status if r["present"]
        ),
        "extended_total": round(sum(extended.values()), 3),
        "extended_queries": extended,
        **replica_out,
        "curation_stages": curation_stages,
        "curation_v3_stages": curation_v3_stages,
        "run_meta": {
            "load_gate": load_gate,
            "canary_gate": canary_gate,
            "loadavg_1m": round(load_start[0], 2),
            "loadavg_5m": round(load_start[1], 2),
            "loadavg_1m_end": round(os.getloadavg()[0], 2),
            "cpus": os.cpu_count(),
            "cpu_canary_pre_sec": canary_pre_s,
            "cpu_canary_par_pre_sec": canary_pre_p,
            "cpu_canary_sec": _cpu_canary(),
            "cpu_canary_par_sec": _cpu_canary_par(),
            "testdata_fingerprint": _testdata_fingerprint(),
        },
    }
    # Emit TWO lines: the fat per-query detail record first, then a
    # SHORT summary line LAST. The driver tail-captures output and
    # parses the final JSON line; r8's single giant line grew past the
    # capture window and truncated its own head, losing the round's
    # headline_total (VERDICT r8 #1). The summary keeps the required
    # {metric, value, unit, queries, sf} contract plus the totals and
    # run_meta — everything bulky (warm/extended per-query dicts,
    # funnel stage timings) lives only on the detail line.
    print(json.dumps({"record": "bench_detail", **out}))
    summary = {
        k: out[k]
        for k in (
            "metric",
            "value",
            "unit",
            "queries",
            "sf",
            "layout_optimization_sec",
            "warm_total",
            "warm_passes",
            "extended_total",
            "comparator_total",
            "queries_ratio",
            "ratio_overall",
            "serve_tables_fresh",
            # replica-scale ratio block (r13 verdict #2): the
            # host-independent numbers rounds diff; per-query walls
            # stay on the detail line
            "replica_factor",
            "replica_build_sec",
            "replica_layout_sec",
            "queries_ratio_replica",
            "ratio_overall_replica",
            "run_meta",
        )
        if k in out
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
