"""Golden end-to-end ingest tests (SURVEY §5.1/§5.5): synthetic IDEA
files -> per-IP daily facts; batch and streaming paths must agree;
invalid timestamps and corrupt JSON are dropped/routed.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from nerd_spark.sources.idea import parse_idea, read_idea_batch, split_corrupt
from nerd_spark.streaming.ingest import facts_from_batch, merge_facts, run_batch, run_stream

AS_OF = "2024-03-10 12:00:00"


def idea(id, detect, cats, node, ips, conns=None, cease=None):
    msg = {
        "ID": id,
        "DetectTime": detect,
        "Category": cats,
        "Node": [{"Name": "upstream"}, {"Name": node}],
        "Source": [{"IP4": ips}],
    }
    if conns is not None:
        msg["ConnCount"] = conns
    if cease is not None:
        msg["CeaseTime"] = cease
    return msg


@pytest.fixture()
def spool(tmp_path):
    msgs = [
        idea("e1", "2024-03-10T10:00:00Z", ["Recon.Scanning"], "cz.nodeA", ["10.0.0.1"], conns=5),
        idea("e2", "2024-03-10T11:00:00Z", ["Recon.Scanning"], "cz.nodeA", ["10.0.0.1", "10.0.0.2"]),
        idea("e3", "2024-03-09T10:00:00+01:00", ["Attempt.Login", "Test"], "cz.nodeB", ["10.0.0.1"]),
        # too old (> 7 days before AS_OF) -> dropped
        idea("e4", "2024-02-01T00:00:00Z", ["Recon.Scanning"], "cz.nodeA", ["10.0.0.9"]),
        # future (> 5 min after AS_OF) -> dropped
        idea("e5", "2024-03-10T12:30:00Z", ["Recon.Scanning"], "cz.nodeA", ["10.0.0.9"]),
    ]
    f1 = tmp_path / "spool"
    f1.mkdir()
    for i, m in enumerate(msgs):
        (f1 / f"msg{i}.json").write_text(json.dumps(m))
    (f1 / "corrupt.json").write_text("{not valid json!!")
    return str(f1)


def _expected_facts():
    # (ip_int, date, node, cats, n, conns); 10.0.0.1 = 167772161
    return {
        (167772161, "2024-03-10", "cz.nodeA", "ReconScanning", 2, 6),
        (167772162, "2024-03-10", "cz.nodeA", "ReconScanning", 1, 1),
        (167772161, "2024-03-09", "cz.nodeB", "AttemptLogin+Test", 1, 1),
    }


def test_parse_and_validity(spark, spool):
    raw = read_idea_batch(spark, spool)
    ok, corrupt = split_corrupt(raw)
    assert corrupt.count() == 1
    parsed = parse_idea(ok, as_of=F.to_timestamp(F.lit(AS_OF)))
    rows = {r.id: r for r in parsed.collect()}
    assert set(rows) == {"e1", "e2", "e3"}  # e4 too old, e5 future
    assert rows["e1"].node == "cz.nodeA"
    assert rows["e3"].cats == "AttemptLogin+Test"
    assert rows["e3"].detect_ts.hour == 9  # +01:00 normalized to UTC
    assert rows["e1"].end_ts == rows["e1"].detect_ts  # coalesce fallback


def test_batch_ingest_golden(spark, spool, tmp_path):
    facts_path = str(tmp_path / "facts")
    run_batch(spark, spool, facts_path, as_of=F.to_timestamp(F.lit(AS_OF)))
    got = {
        (r.ip_int, r.date, r.node, r.cats, r.n, r.conns)
        for r in spark.read.parquet(facts_path).collect()
    }
    assert got == _expected_facts()


def test_incremental_merge_reaggregates(spark, spool, tmp_path):
    facts_path = str(tmp_path / "facts")
    as_of = F.to_timestamp(F.lit(AS_OF))
    run_batch(spark, spool, facts_path, as_of=as_of)
    # replay the same batch: additive merge doubles counts (at-least-
    # once apply semantics of the op algebra `add`)
    run_batch(spark, spool, facts_path, as_of=as_of)
    got = {
        (r.ip_int, r.date, r.node, r.cats, r.n, r.conns)
        for r in spark.read.parquet(facts_path).collect()
    }
    assert got == {(i, d, nd, c, n * 2, cn * 2) for i, d, nd, c, n, cn in _expected_facts()}


def test_stream_matches_batch(spark, spool, tmp_path):
    """Replay determinism: the streaming path (foreachBatch) produces
    exactly the batch path's table."""
    facts_path = str(tmp_path / "facts_stream")
    q = run_stream(
        spark,
        spool,
        facts_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        as_of=F.to_timestamp(F.lit(AS_OF)),
    )
    q.awaitTermination(120)
    got = {
        (r.ip_int, r.date, r.node, r.cats, r.n, r.conns)
        for r in spark.read.parquet(facts_path).collect()
    }
    assert got == _expected_facts()
