"""Stage-level timing of minhash_lsh_dedup at a given data dir.

Run: PYTHONPATH=/root/repo python audits/profile_minhash_stages.py <dir>
"""

import sys
import time

from pyspark.sql import functions as F

from nerd_spark.operators import dedup as DD
from nerd_spark.session import get_spark, read_table


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile_minhash_stages", shuffle_partitions=32)
    docs = read_table(spark, data_dir, "documents")
    docs.count()
    spark.range(1000).selectExpr("sum(id)").collect()

    t0 = time.monotonic()
    spread = DD._spread(docs)
    t_spread_plan = time.monotonic() - t0

    sarr = DD.shingle_arrays(spread, "doc_id", "text", 3).cache()
    t0 = time.monotonic()
    n_docs = sarr.count()  # materialize cache
    t_shingle = time.monotonic() - t0

    n_hashes = 12
    sh = sarr.select("id", F.explode("sarr").alias("s"))
    m = F.md5("s")
    sh2 = sh.select(
        "id",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    mh_wide = sh2.groupBy("id").agg(
        *[
            F.min((F.col("h1") + i * F.col("h2")) % F.lit(2**32)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_sigs = [
        F.md5(F.concat_ws(
            "|", *[F.col(f"h{b * 3 + r}").cast("string") for r in range(3)]
        )).alias(f"sig{b}")
        for b in range(4)
    ]
    mh = (
        mh_wide.select("id", *band_sigs)
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("b"), F.col(f"sig{b}").alias("h"))
                        for b in range(4)
                    ]
                )
            ).alias("bh"),
        )
        .select("id", F.col("bh.b").alias("b"), F.col("bh.h").alias("h"))
        .cache()
    )
    t0 = time.monotonic()
    n_sigs = mh.count()
    t_sigs = time.monotonic() - t0

    cand = (
        mh.alias("x")
        .join(mh.alias("y"), ["b", "h"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
        .distinct()
    ).cache()
    t0 = time.monotonic()
    n_cand = cand.count()
    t_cand = time.monotonic() - t0

    sets = sarr.select("id", F.array_distinct("sarr").alias("ss"))
    t0 = time.monotonic()
    n_out = (
        DD._pair_jaccard(cand, sets).filter(F.col("jaccard") >= 0.5).count()
    )
    t_verify = time.monotonic() - t0

    print(
        f"docs={n_docs} sigs={n_sigs} cand={n_cand} out={n_out}\n"
        f"spread_plan={t_spread_plan:.2f}s shingle+cache={t_shingle:.2f}s "
        f"signatures={t_sigs:.2f}s candidates={t_cand:.2f}s verify={t_verify:.2f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
