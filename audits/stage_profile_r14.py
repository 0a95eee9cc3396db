#!/usr/bin/env python
"""Event-log stage profile of one registered query on a data dir —
r14 session-2 measure-first tooling (guide §1/§7): per-stage wall,
task count, shuffle read/write bytes and records, so exchange-width
pathologies (AQE coalescing a pair exchange to a handful of tasks)
are visible without the UI (spark.ui.enabled=false in the session).

Run: PYTHONPATH=/root/repo python audits/stage_profile_r14.py <dir> <query> [shuffle_partitions]
"""
import json
import os
import sys
import tempfile
import time


def main():
    data_dir = sys.argv[1]
    qname = sys.argv[2]
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else None

    evdir = tempfile.mkdtemp(prefix="nerd_evlog_")
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import get_spark, read_table

    spark = get_spark(
        app_name=f"stage_profile_{qname}",
        shuffle_partitions=parts,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in "lineitem orders customer nation region events documents embeddings".split():
        read_table(spark, data_dir, t).count()

    spark.sparkContext.setJobDescription(f"profile:{qname}")
    t0 = time.perf_counter()
    REGISTRY[qname](spark, data_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 may write a rolling dir
    # eventlog_v2_<appid>/ with one or more events_* files)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts_files = sorted(
            f for f in os.listdir(d) if not f.startswith("appstatus")
        )
        lines = []
        for f in parts_files:
            lines.extend(open(os.path.join(d, f)).read().splitlines())
    else:
        lines = open(path).read().splitlines()
    stages = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                mets = {
                    m["Name"]: m.get("Value", 0)
                    for m in si.get("Accumulables", [])
                }
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "tasks": si["Number of Tasks"],
                    "sec": round((comp - sub) / 1000.0, 2)
                    if sub and comp
                    else None,
                    "sh_read_mb": round(
                        (
                            mets.get("internal.metrics.shuffle.read.localBytesRead", 0)
                            + mets.get(
                                "internal.metrics.shuffle.read.remoteBytesRead", 0
                            )
                        )
                        / 1e6,
                        1,
                    ),
                    "sh_write_mb": round(
                        mets.get("internal.metrics.shuffle.write.bytesWritten", 0)
                        / 1e6,
                        1,
                    ),
                    "sh_read_rows": mets.get(
                        "internal.metrics.shuffle.read.recordsRead", 0
                    ),
                    "sh_write_rows": mets.get(
                        "internal.metrics.shuffle.write.recordsWritten", 0
                    ),
                    "cpu_sec": round(
                        mets.get("internal.metrics.executorCpuTime", 0) / 1e9, 2
                    ),
                    "run_sec": round(
                        mets.get("internal.metrics.executorRunTime", 0) / 1e3, 2
                    ),
                }
    big = sorted(
        stages.items(), key=lambda kv: -(kv[1]["sec"] or 0)
    )
    print(json.dumps({"query": qname, "wall_sec": wall, "n_stages": len(stages)}))
    for sid, s in big[:20]:
        print(f"stage {sid:4d} {s['sec']:>8}s tasks={s['tasks']:<4} "
              f"cpu={s['cpu_sec']:>8} run={s['run_sec']:>8} "
              f"shR={s['sh_read_mb']:>8}MB/{s['sh_read_rows']:>10} "
              f"shW={s['sh_write_mb']:>8}MB/{s['sh_write_rows']:>10}  {s['name']}")


if __name__ == "__main__":
    main()
