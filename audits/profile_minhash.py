"""Time dedup_minhash_lsh + dedup_ngram_jaccard at sf0.1 (VERDICT r2 #2).

Run: PYTHONPATH=/root/repo python audits/profile_minhash.py
"""

import time

from nerd_spark.operators import dedup as DD
from nerd_spark.session import get_spark, read_table


def main():
    spark = get_spark(app_name="profile_minhash", shuffle_partitions=32)
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()  # warm the file listing
    for rep in range(3):
        t0 = time.monotonic()
        n = DD.minhash_lsh_dedup(
            spark, docs, n_bands=4, rows_per_band=3, threshold=0.5
        ).count()
        t1 = time.monotonic()
        m = DD.jaccard_dedup(docs, threshold=0.8, max_df=20).count()
        t2 = time.monotonic()
        print(
            f"rep{rep} minhash: {t1 - t0:.2f}s rows={n} | "
            f"jaccard: {t2 - t1:.2f}s rows={m}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
