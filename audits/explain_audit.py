#!/usr/bin/env python
"""Physical-plan audit: assert the optimizations the engine is
designed around actually appear in the executed plans (run at any sf:
`python audits/explain_audit.py [sf_dir]`). See PLANS.md for the
expected shape of each plan and why it holds at 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EXPECT = {
    # scan-side: predicate pushdown + column pruning reach parquet
    "q1_pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
    "s5_point_read": ["PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"],
    "p1_projection": ["ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>"],
    # top-k never global-sorts; last-N prunes inside the window
    "w1_topk": ["TakeOrderedAndProject"],
    "w4_last_n_per_key": ["WindowGroupLimit"],
    # dimension joins broadcast (no shuffle of the big side)
    "j2_enrichment_chain": ["BroadcastHashJoin"],
    "j6_bulk_lookup": ["BroadcastHashJoin"],
    "a12_refcount_rebuild": ["BroadcastHashJoin"],
    "j1_equi_join": ["BroadcastHashJoin"],
    # small-dim range join -> broadcast nested loop with codegen'd BETWEEN
    "j4_range_join": ["BroadcastNestedLoopJoin"],
    "a2_window_totals": ["HashAggregate"],
    # round 2: FMP assembly — dims broadcast, prefix join-back hashed,
    # scoring via Arrow-batched pandas UDF (no row-at-a-time Python)
    "fmp_score": ["BroadcastHashJoin", "ArrowEvalPython", "HashAggregate"],
    # multi-source reputation reuses ONE base-rollup exchange across
    # all five extractor branches
    "a7_total_multi": ["ReusedExchange", "HashAggregate"],
    # typed record pipeline: partial/final agg + broadcast as_of
    "ip_records": ["HashAggregate", "BroadcastNestedLoopJoin"],
    # round 3: §3.2 read path composed as ONE plan over the typed
    # record table — top-k prunes before the broadcast enrichment hops
    # and the date-by-category pivot
    "read_path_typed": ["TakeOrderedAndProject", "BroadcastHashJoin"],
    # round 6: span dedup = map-only blocking + ONE DF-count shuffle;
    # semantic dedup broadcasts the centroid table (never the corpus)
    "text_span_dedup": ["HashAggregate", "Generate explode"],
    "dedup_semantic": ["BroadcastNestedLoopJoin"],
    # round 7: the PQ family — ADC scan is a broadcast of the (tiny)
    # query side against the map-only-encoded corpus; the on-disk
    # IVF-PQ probe must show the literal cid partition filter (file
    # pruning) and broadcast-only joins (no corpus shuffle)
    "ann_pq_topk": ["BroadcastNestedLoopJoin", "BroadcastHashJoin"],
    "ann_ivf_indexed": ["PartitionFilters: [cid"],
    "ann_ivfpq_indexed": ["PartitionFilters: [cid", "BroadcastHashJoin"],
    # round 8/10: the sketch family — the r10 cardinality probe
    # (layout sidecar / HLL scan) routes hh_event_users' bounded user
    # domain to ONE plain map-side-combined count: HashAggregate
    # pairs and NO screen stage (the screen path's broadcast-semi
    # verify shape stays pinned by tests/test_sketches.py's forced
    # plain_max_distinct=0 test);
    # hh_terms is all MapInPandas pair-emit (no explode / token rows);
    # grouped quantiles (r9: the probe picks the value-histogram
    # strategy on this bounded domain) broadcast the per-group totals
    # and select by cumulative sum over the distinct-value window —
    # no GK sketch and never a global Sort of the column
    "hh_event_users": ["HashAggregate"],
    "hh_terms": ["MapInPandas"],
    "quantile_by_event_type": ["BroadcastHashJoin", "Window [sum(cnt"],
    # round 10: j5's as-of is a carry-forward window — ONE exchange on
    # the user key and NO join at all (the fan-out join form grew
    # quadratically in per-user activity; "!" marks must be absent);
    # funnel/cohort stage filters push to the parquet scan and the
    # per-user scalar joins stay hash/broadcast; containment's
    # candidate verify broadcasts the probe-bounded pair frame
    "j5_asof_join": ["Window [last(", "!Join"],
    # funnel gathers only stage-typed events (pushed In filter) into
    # ONE user-key aggregation; cohort's day-set aggregation is a
    # single ObjectHashAggregate over the whole corpus (the anchor
    # rides the same pass), with no join wider than the tiny
    # (cohort, period) frames
    "funnel_stages": ["In(event_type, [", "ObjectHashAggregate"],
    "cohort_retention": ["ObjectHashAggregate", "PushedFilters: [IsNotNull(ts), IsNotNull(user_id)]"],
    "dedup_containment": ["BroadcastHashJoin"],
}


def main() -> int:
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain_audit")
    failures = []
    for name, marks in EXPECT.items():
        df = REGISTRY[name](spark, sf_dir)
        df.collect()  # finalize AQE so runtime re-plans (ReusedExchange,
        # coalesced shuffles, switched join strategies) are visible
        plan = df._jdf.queryExecution().executedPlan().toString()
        for m in marks:
            ok = (m[1:] not in plan) if m.startswith("!") else (m in plan)
            print(("OK  " if ok else "MISS") + f" {name}: {m}")
            if not ok:
                failures.append((name, m))
    spark.stop()
    if failures:
        print("FAILED:", failures)
        return 1
    print("all plan audits passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
