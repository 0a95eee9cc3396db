from __future__ import annotations

import math

from pyspark.sql import functions as F

from nerd_spark.functions.ip import int2ipstr, ipstr2int, prefix24, subnet_predicate
from nerd_spark.functions.mathx import ewma_expr, ewma_weights, nonlin, prob_or
from nerd_spark.functions.text import (
    fingerprint,
    quality_features,
    token_count,
    word_shingles,
)
from nerd_spark.functions.timeutil import end_time, parse_rfc_time, validity_filter


def test_ip_roundtrip(spark):
    ips = ["0.0.0.0", "10.0.0.1", "192.168.1.255", "255.255.255.255", "147.32.80.1"]
    df = spark.createDataFrame([(ip,) for ip in ips], ["ip"])
    rows = df.select(
        ipstr2int("ip").alias("i"), int2ipstr(ipstr2int("ip")).alias("back"), "ip"
    ).collect()
    import ipaddress

    for r in rows:
        assert r.i == int(ipaddress.ip_address(r.ip))
        assert r.back == r.ip


def test_prefix24_and_subnet(spark):
    df = spark.createDataFrame([("10.1.2.3",), ("10.1.2.250",), ("10.1.3.1",)], ["ip"])
    out = df.select(
        prefix24(ipstr2int("ip")).alias("p"),
        subnet_predicate(ipstr2int("ip"), "10.1.2.0/24").alias("in24"),
    ).collect()
    assert out[0].p == out[1].p != out[2].p
    assert [r.in24 for r in out] == [True, True, False]


def test_nonlin_matches_reference_formula(spark):
    # nonlin(v, s, c) = min(1 - c^(v/s), 1)  (reputation.py:16-21)
    df = spark.createDataFrame([(0.0,), (1.0,), (5.0,), (None,)], "v double")
    rows = df.select(nonlin("v", scale=2.0, base=0.5).alias("x")).collect()
    exp = [1 - 0.5 ** (v / 2.0) for v in (0.0, 1.0, 5.0, 0.0)]
    for r, e in zip(rows, exp):
        assert math.isclose(r.x, min(e, 1.0), rel_tol=1e-12)


def test_ewma(spark):
    ws = ewma_weights()
    assert math.isclose(sum(ws), 1 - 0.75**7, rel_tol=1e-12)
    df = spark.createDataFrame([(3.0, 0.0, 2.0)], ["d0", "d1", "d2"])
    counts = [F.col("d0"), F.col("d1"), F.col("d2")] + [F.lit(0)] * 4
    row = df.select(
        ewma_expr(counts).alias("e"), ewma_expr(counts, binary=True).alias("b")
    ).first()
    assert math.isclose(row.e, 3 * ws[0] + 2 * ws[2], rel_tol=1e-12)
    assert math.isclose(row.b, ws[0] + ws[2], rel_tol=1e-12)


def test_prob_or(spark):
    df = spark.createDataFrame([(0.5, 0.5), (0.0, 0.9), (None, 0.9)], ["a", "b"])
    rows = df.select(prob_or([F.col("a"), F.col("b")]).alias("r")).collect()
    assert math.isclose(rows[0].r, 0.75, rel_tol=1e-12)
    assert math.isclose(rows[1].r, 0.9, rel_tol=1e-12)
    assert math.isclose(rows[2].r, 0.9, rel_tol=1e-12)


def test_time_helpers(spark):
    df = spark.createDataFrame(
        [("2024-03-01T12:00:00+01:00", None, None, "2024-03-01T10:59:00Z")],
        "cease string, win string, ev string, det string",
    )
    row = df.select(
        parse_rfc_time("cease").alias("c"),
        end_time("cease", "win", "ev", "det").alias("e"),
    ).first()
    assert row.c.hour == 11  # normalized to UTC
    assert row.e == row.c


def test_validity_filter(spark):
    now = F.to_timestamp(F.lit("2024-03-10 00:00:00"))
    df = spark.createDataFrame(
        [("2024-03-09 23:00:00",), ("2024-03-01 00:00:00",), ("2024-03-10 00:10:00",)],
        ["ts"],
    ).select(F.to_timestamp("ts").alias("ts"))
    rows = df.select(validity_filter("ts", now).alias("ok")).collect()
    assert [r.ok for r in rows] == [True, False, False]


def test_text_functions(spark):
    df = spark.createDataFrame([("The quick, brown fox — and the dog!",)], ["text"])
    q = quality_features("text")
    row = df.select(
        token_count("text").alias("tc"),
        word_shingles("text", 3).alias("sh"),
        fingerprint("text").alias("fp"),
        q["punct_ratio"].alias("pr"),
        q["stopword_ratio"].alias("sr"),
    ).first()
    assert row.tc == 8
    assert row.sh[0] == "The quick, brown"
    assert len(row.sh) == 6
    assert len(row.fp) == 32
    assert 0 < row.pr < 1
    assert row.sr > 0


def test_short_doc_shingles_empty(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    assert df.select(word_shingles("text", 3).alias("s")).first().s == []


def test_ipstr2int_malformed_is_null(spark):
    # reference's ipstr2int raises on malformed input (common/utils.py:9-13);
    # the column form NULLs out instead of silently mis-bucketing
    bad = ["1.2.3", "1.2.3.4.5", "1.2.3.256", "a.b.c.d", "", "10..0.1", "1.2.3.04x"]
    good = {"0.0.0.0": 0, "10.0.0.1": 167772161, "1.2.3.004": 16909060}
    df = spark.createDataFrame([(ip,) for ip in bad + list(good)], ["ip"])
    rows = {r.ip: r.i for r in df.select("ip", ipstr2int("ip").alias("i")).collect()}
    for ip in bad:
        assert rows[ip] is None, ip
    for ip, want in good.items():
        assert rows[ip] == want, ip


def test_pii_scrub(spark):
    from nerd_spark.functions.text import pii_counts, scrub_pii

    cases = [
        # (text, n_email, n_ipv4, n_phone)
        ("mail a.b+tag@ex-1.co and c@d.org now", 2, 0, 0),
        ("host 192.168.0.1 and 10.0.0.255 up", 0, 2, 0),
        ("call +1 (555) 010-2030 or 0800 123 4567 now", 0, 0, 2),
        ("plain text, no pii at all", 0, 0, 0),
        ("x@y.io at 8.8.8.8 ring 555-123-4567", 1, 1, 1),
        ("", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, *_) in enumerate(cases)], "i long, s string"
    )
    cnt = pii_counts("s")
    res = pii_counts(scrub_pii("s"))
    rows = {
        r.i: r
        for r in df.select(
            "i",
            cnt["email"].alias("e"),
            cnt["ipv4"].alias("ip"),
            cnt["phone"].alias("ph"),
            (res["email"] + res["ipv4"] + res["phone"]).alias("left"),
            scrub_pii("s").alias("sc"),
        ).collect()
    }
    for i, (s, e, ip, ph) in enumerate(cases):
        r = rows[i]
        assert (r.e, r.ip, r.ph) == (e, ip, ph), (s, r)
        assert r.left == 0, (s, r.sc)
    # placeholders actually landed
    assert rows[4].sc == "<EMAIL> at <IPV4> ring <PHONE>"


def test_unscaled_long_equals_decimal_formulation(spark):
    """exact_sum's boundary-gated unscaled-long extraction must equal
    the DECIMAL(18,4) formulation bit-for-bit — including adversarial
    values parked within a float-ulp of the x.00005 half-up boundary
    (the region the fast floor path must hand to the exact branch)
    and negatives."""
    import random

    from pyspark.sql import functions as F

    from nerd_spark.queries.base import _dec, _unscaled

    rng = random.Random(42)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(2000)]
    # adversarial: exact .00005 boundaries (inexact in binary, so the
    # double lands a hair to one side), scaled across magnitudes
    vals += [k / 10 + 5e-5 for k in range(-50, 50)]
    vals += [k + 0.12345 for k in range(-20, 20)]
    vals += [1234.500049999, 1234.500050001, -1234.500049999, 0.0, 1e-12]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = df.select(
        _unscaled("v").alias("fast"),
        (F.col("v").isNotNull() & True).alias("_"),
        (_dec("v") * 10000).cast("long").alias("exact"),
    )
    bad = out.filter(F.col("fast") != F.col("exact")).count()
    assert bad == 0
