"""Unit tests for categorization, entity-query filters and retention."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from nerd_spark.plans.categorization import CategoryRule, categorize
from nerd_spark.plans.filters import EntityQuery, search
from nerd_spark.plans.retention import expire_entities, prune_history


def test_categorize_multi_match(spark):
    ev = spark.createDataFrame(
        [(1, "error", 200.0), (2, "signup", 10.0), (3, "view", 5.0)],
        "event_id long, event_type string, value double",
    )
    rules = [
        CategoryRule("big", "value > 100"),
        CategoryRule("err", "event_type == 'error'", "event_type"),
    ]
    rows = {(r.event_id, r.category, r.subcategory) for r in categorize(ev, rules).collect()}
    # event 1 matches BOTH rules; 2 and 3 match none
    assert rows == {(1, "big", None), (1, "err", "error")}


def test_categorize_python_fallback(spark):
    """A trigger the DSL grammar can't parse falls back to the
    restricted-Python escape hatch (the reference's free-form eval
    triggers, threat_categorization.py:144-195) — and unsafe
    expressions are rejected at plan time, not evaluated."""
    import pytest

    from nerd_spark.plans.categorization import python_trigger_column

    ev = spark.createDataFrame(
        [
            (1, "error", "port scan detected on net"),
            (2, "view", "ssh scan"),
            (3, "error", "ok"),
        ],
        "event_id long, event_type string, description string",
    )
    rules = [
        # len()/split() + re.search: outside the DSL grammar
        CategoryRule(
            "scan",
            "len(description.split()) >= 2 and re.search('scan', description) is not None",
        ),
        # still-DSL rule in the same config keeps the fast path
        CategoryRule("err", "event_type == 'error'"),
    ]
    rows = {(r.event_id, r.category) for r in categorize(ev, rules).collect()}
    assert rows == {(1, "scan"), (1, "err"), (2, "scan"), (3, "err")}

    # per-row evaluation errors mean "not matched", never a crash
    ev2 = ev.withColumn(
        "description", F.when(F.col("event_id") == 2, None).otherwise("x scan y")
    )
    got = {
        (r.event_id, r.category)
        for r in categorize(ev2, rules[:1]).collect()
    }
    assert got == {(1, "scan"), (3, "scan")}

    # the sandbox: dunders, imports, unknown names all refuse to compile
    for bad in (
        "__import__('os').system('true')",
        "().__class__",
        "open('/etc/passwd')",
        "description.__len__()",
        "exec('1')",
    ):
        with pytest.raises(ValueError):
            python_trigger_column(bad, ev)


def test_python_trigger_resource_guards(spark):
    """The sandbox also bounds CPU/memory, not just code execution:
    huge sequence repetition and oversized/pathological regexes are
    refused (per-row -> False; constant-folded -> False at plan time)
    instead of hanging or OOMing an executor."""
    from nerd_spark.plans.categorization import (
        _SafeRe,
        compile_report,
        CategoryRule,
        python_trigger_column,
    )

    ev = spark.createDataFrame(
        [(1, "error", "scan detected")],
        "event_id long, event_type string, description string",
    )
    # description * 10**10 would allocate ~120 GB; the guarded `*`
    # raises inside the row eval -> trigger not matched, job healthy
    col = python_trigger_column("len(description * 10000000000) > 0", ev)
    assert [r[0] for r in ev.select(col).collect()] == [False]
    # numeric math through the same guard still works
    col2 = python_trigger_column("event_id * 3 == 3", ev)
    assert [r[0] for r in ev.select(col2).collect()] == [True]
    # constant-folded repetition refuses at plan time (lit False)
    col3 = python_trigger_column("len('x' * 10000000000) > 0", ev)
    assert [r[0] for r in ev.select(col3).collect()] == [False]

    import pytest

    # regex caps: oversized pattern and stacked quantifiers refuse
    with pytest.raises(ValueError):
        _SafeRe().search("a" * 300, "x")
    with pytest.raises(ValueError):
        _SafeRe().search("(a+)+" * 11, "x")
    # normal pattern passes (and hits the compiled cache on reuse)
    assert _SafeRe().search("scan", "port scan") is not None


def test_categorization_compile_report(spark, caplog):
    """compile_report names each rule's compile path (column / python
    / error), and a fallback hit logs the structured warning — the
    deploy-time lint for rules that silently land on the slow path."""
    import logging

    from nerd_spark.plans.categorization import (
        CategoryRule,
        compile_report,
        trigger_column,
    )

    ev = spark.createDataFrame(
        [(1, "error", "port scan")],
        "event_id long, event_type string, description string",
    )
    rules = [
        CategoryRule("err", "event_type == 'error'"),
        CategoryRule("scan", "len(description.split()) >= 2"),
        CategoryRule("broken", "this is ! not parseable ("),
    ]
    rep = {r["category"]: r for r in compile_report(rules, ev)}
    assert rep["err"]["path"] == "column"
    assert rep["scan"]["path"] == "python" and rep["scan"]["detail"]
    assert rep["broken"]["path"] == "error"

    with caplog.at_level(logging.WARNING, logger="nerd_spark.categorization"):
        trigger_column(rules[1].condition, ev)
    assert any("restricted-Python" in m for m in caplog.messages)


def test_entity_query_families(spark):
    df = spark.createDataFrame(
        [
            ("a", 167772161, "moc.elpmaxe.vrs"[::-1], "CZ", ["scan"], {"w": 1}, 0.9, "p1"),
            ("b", 167772400, "gro.tset.liam"[::-1], "DE", [], {}, 0.5, "p2"),
        ],
        "entity string, ip_int long, hostname string, ctry string, "
        "cats array<string>, tags map<string,int>, rep double, bgppref string",
    )
    spec = EntityQuery(subnet="10.0.0.0/24", ctry_in=["CZ"], cats_any=["scan"], rep_min=0.5)
    got = [r.entity for r in df.filter(spec.compile(df)).collect()]
    assert got == ["a"]
    # hostname suffix via the reversed-prefix trick
    spec2 = EntityQuery(hostname_suffix=".com")
    assert [r.entity for r in df.filter(spec2.compile(df)).collect()] == ["a"]
    # sort/limit surface
    out = search(df, EntityQuery(), sort_by="rep", limit=1)
    assert [r.entity for r in out.collect()] == ["a"]


def test_retention_ttl(spark):
    now = F.to_timestamp(F.lit("2024-03-10 00:00:00"))
    df = spark.createDataFrame(
        [
            ("live", {"warden": datetime(2024, 3, 20)}),
            ("dead", {"warden": datetime(2024, 3, 1)}),
            ("immortal", {"*": datetime(1970, 1, 1), "x": datetime(2024, 1, 1)}),
            ("mixed", {"a": datetime(2024, 3, 1), "b": datetime(2024, 4, 1)}),
        ],
        "entity string, _ttl map<string,timestamp>",
    )
    out = {r.entity: r["_ttl"] for r in expire_entities(df, now).collect()}
    assert set(out) == {"live", "immortal", "mixed"}
    assert set(out["mixed"]) == {"b"}  # expired token dropped
    assert "*" in out["immortal"]


def test_prune_history(spark):
    now = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    df = spark.createDataFrame(
        [("2024-05-30",), ("2024-01-01",)], "d string"
    ).select(F.to_date("d").alias("d"))
    kept = prune_history(df, now, max_age_days=90).collect()
    assert [str(r.d) for r in kept] == ["2024-05-30"]


def test_partial_reputation_half_life(spark):
    """Half-life decay and the nonlin saturation cap, checked against a
    hand-computed value (reference: reputation.py:16-21,120-136)."""
    import datetime

    from nerd_spark.plans.reputation import SourceParams, partial_reputation

    daily = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 10), 100), (1, datetime.date(2024, 1, 8), 3)],
        "entity long, d date, num_events long",
    )
    as_of = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 10, 12, 0),)], "as_of timestamp"
    )
    p = SourceParams(scale_events=2.0, date_range=4, time_decay="half_life",
                     half_life=2.0)
    [row] = partial_reputation(daily, as_of, p).collect()
    # weights: age0=1, age2=0.5; denom = 1 + 2^-0.5 + 0.5 + 2^-1.5
    # day age0: v/s = 50 > 20 -> exactly 1.0 (the cap)
    denom = 1 + 0.5 ** 0.5 + 0.5 + 0.5 ** 1.5
    expected = round((1.0 * 1 + (1 - 0.5 ** 1.5) * 0.5) / denom, 6)
    assert row.rep == expected


def test_combine_total_missing_source(spark):
    """Entities absent from a source contribute rep_src=0 (factor 1),
    as in the reference's rec.get(f"_rep_{mod}", 0)."""
    from nerd_spark.plans.reputation import combine_total

    a = spark.createDataFrame([(1, 0.5), (2, 0.2)], "entity long, r double")
    b = spark.createDataFrame([(1, 0.4)], "entity long, r double")
    out = {r.entity: r.rep for r in combine_total(
        [(a, "s1", 1.0), (b, "s2", 0.5)]).collect()}
    assert out[1] == round(1 - (1 - 0.5) * (1 - 0.4 * 0.5), 6)
    assert out[2] == round(1 - (1 - 0.2), 6)


def test_fmp_model_seam(spark, sf_dir):
    """score(predict=...) feeds the transformed 39-feature matrix to a
    custom batch scorer (the XGBoost seam) — verified with a model
    that returns the first transformed feature."""
    import numpy as np

    from nerd_spark.ml.fmp import FEATURES, assemble_features, score
    from nerd_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    feats = assemble_features(ev, cust, nat)

    out = score(feats, predict=lambda m: m[:, 0])
    rows = out.select("entity", FEATURES[0], "fmp").collect()
    assert len(rows) > 0
    for r in rows:  # transform of alerts_1d is round(ln(1+x), 6)
        assert abs(r.fmp - round(np.log(1.0 + r[1]), 6)) < 1e-9


def test_python_trigger_constant_regexes_validate_at_compile(spark):
    """Constant regex arguments to re.* calls are checked at PLAN
    time: an over-cap or syntactically invalid pattern rejects the
    rule loudly (and compile_report says 'error'), instead of
    silently matching nothing per row (ADVICE r6). Row-built patterns
    stay runtime-checked, and the re.IGNORECASE/I flags are usable."""
    import pytest

    from nerd_spark.plans.categorization import (
        CategoryRule,
        compile_report,
        python_trigger_column,
    )

    ev = spark.createDataFrame(
        [(1, "SCAN detected"), (2, "ok")],
        "event_id long, description string",
    )
    # over-cap length, over-cap quantifiers, invalid syntax: all refuse
    for bad in (
        f"re.search('{'a' * 300}', description) is not None",
        f"re.search('{'(a+)+' * 11}', description) is not None",
        "re.search('(unclosed', description) is not None",
    ):
        with pytest.raises(ValueError):
            python_trigger_column(bad, ev)
    # compile_report calls such a rule 'error', not 'python'
    rep = compile_report(
        [CategoryRule("x", "re.search('(unclosed', description) is not None")],
        ev,
    )
    assert rep[0]["path"] == "error"
    # flags surface: re.IGNORECASE reaches _SafeRe and works per row
    col = python_trigger_column(
        "re.search('scan', description, re.IGNORECASE) is not None", ev
    )
    assert [r[0] for r in ev.select(col).collect()] == [True, False]
    # a pattern assembled from the row is still runtime-guarded:
    # over-cap at eval time -> False, no crash
    col2 = python_trigger_column(
        "re.search(description * 40, description) is not None", ev
    )
    assert [r[0] for r in ev.select(col2).collect()] == [False, False]


def test_stored_column_explode_safe_under_optimizer_exclusion(spark, tmp_path):
    """InferFiltersFromGenerate is excluded session-wide (session.py —
    measured 5-10x tax on explode-over-computed-array plans). This
    pins what that costs STORED-column explodes, so future queries
    can't silently lose filtering (VERDICT r6 #6):

    1. semantics are unchanged — Generate itself drops null/empty
       arrays, so results equal the rule-active plan exactly;
    2. the rule's scan-level pruning is recoverable EXPLICITLY — a
       written-out size(arr)>0 filter still reaches the parquet scan
       as DataFilters under the exclusion (pushdown machinery is
       independent of the excluded rule). Queries exploding stored
       arrays over selective data should write that filter.
    """
    from pyspark.sql import functions as F

    p = str(tmp_path / "arrs.parquet")
    spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None), (4, ["c"])],
        "id long, arr array<string>",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    q = df.select("id", F.explode("arr").alias("x"))

    assert "InferFiltersFromGenerate" in (
        spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    )
    rows_excluded = sorted(tuple(r) for r in q.collect())
    excl = spark.conf.get("spark.sql.optimizer.excludedRules")
    try:
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        q2 = df.select("id", F.explode("arr").alias("x"))
        rows_active = sorted(tuple(r) for r in q2.collect())
    finally:
        spark.conf.set("spark.sql.optimizer.excludedRules", excl)
    assert rows_excluded == rows_active == [(1, "a"), (1, "b"), (4, "c")]

    # explicit pre-explode pruning still pushes to the scan
    q3 = df.filter(F.size("arr") > 0).select("id", F.explode("arr").alias("x"))
    scan = [
        line
        for line in q3._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan" in line
    ][0]
    assert "DataFilters: [(size(arr" in scan, scan
    assert sorted(tuple(r) for r in q3.collect()) == rows_excluded
