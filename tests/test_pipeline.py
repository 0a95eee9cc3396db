"""Golden test for the composed entity snapshot: hand-computed
expectations over a tiny fixed fact set."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nerd_spark.plans.pipeline import build_entity_snapshot


def test_snapshot_golden(spark):
    # as_of day = 2024-03-10; entity 1: events on age 0 (2x cats) and
    # age 2; entity 2: one old event (age 20)
    daily = spark.createDataFrame(
        [
            (1, "2024-03-10", "scan", 8),
            (1, "2024-03-10", "login", 1),
            (1, "2024-03-08", "scan", 2),
            (2, "2024-02-19", "scan", 3),
        ],
        "entity long, d string, cat string, n long",
    ).select("entity", F.to_date("d").alias("d"), "cat", "n")
    as_of = spark.createDataFrame(
        [("2024-03-10 00:00:00",)], "as_of string"
    ).select(F.to_timestamp("as_of").alias("as_of"))

    cfg = {"busy": {"condition": "total7 >= 11", "confidence": "ewma"}}
    out = {r.entity: r for r in build_entity_snapshot(daily, as_of, tags_cfg=cfg).collect()}

    e1 = out[1]
    assert e1.events_meta.total == 11
    assert e1.events_meta.total1 == 9  # today only (age<=1)
    assert e1.events_meta.total7 == 11
    assert e1.events_meta.cats_7d == 2
    # ewma: age0 nd=9, age2 nd=2 -> 9*.25 + 2*.25*.75^2
    assert math.isclose(e1.events_meta.ewma, round(9 * 0.25 + 2 * 0.25 * 0.75**2, 6))
    # type profile: scan 10/11, login 1/11 — both >=5% of total>=10
    assert e1.events_meta.types == ["login", "scan"]
    # reputation: day age0: nonlin(9,5)*nonlin(2,2)*w(14/14);
    # day age2: nonlin(2,5)*nonlin(1,2)*w(12/14); denom = 7.5
    n = lambda v, s: 1 - 0.5 ** (v / s)
    rep = (n(9, 5) * n(2, 2) * 1.0 + n(2, 5) * n(1, 2) * (12 / 14)) / 7.5
    assert math.isclose(e1.rep, round(rep, 6), abs_tol=1e-9)
    assert str(e1.last_activity) == "2024-03-10"
    assert str(e1["_ttl"]["warden"]).startswith("2024-03-24")
    assert e1.tags["busy"].confidence == e1.events_meta.ewma

    e2 = out[2]
    assert e2.events_meta.total == 3 and e2.events_meta.total30 == 3
    assert e2.events_meta.total7 == 0 and e2.events_meta.ewma == 0.0
    assert e2.rep == 0.0  # outside the 14-day reputation window
    assert e2.events_meta.types is not None and e2.events_meta.types == []
    assert e2.tags is None
