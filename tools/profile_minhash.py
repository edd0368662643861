"""Stage-level profile of text_minhash_lsh_dedup at a given SF dir.

Times each sub-stage with the noop sink (guide §1.4), warm (second
iteration reported), labeled jobs. Usage:
    python tools/profile_minhash.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans import text_plans as tp
from mariadb_columnstore_engine_spark.session import get_session


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s")
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(
        "profile-minhash",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    for it in range(2):
        print(f"--- iteration {it} ({'cold' if it == 0 else 'warm'}) ---")
        spark.catalog.clearCache()
        t = Catalog(spark, sf_dir)
        docs = tp._shingled_docs(t.documents, "doc_id").cache()
        timed("docs cache fill", lambda: noop(docs))
        tok = docs.select("doc_id", F.explode("sh").alias("s")).select(
            "doc_id", tp._hash24(F.col("s")).alias("h")
        )
        mh_cols = [
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % tp.P).alias(f"m{j}")
            for j, (a, b) in enumerate(tp.HASH_AB)
        ]
        mh = tok.groupBy("doc_id").agg(*mh_cols).join(docs, "doc_id").cache()
        timed("mh cache fill", lambda: noop(mh))
        band_structs = [
            F.struct(
                F.lit(k).alias("band_id"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"m{j}")
                        for j in range(
                            k * tp.ROWS_PER_BAND, (k + 1) * tp.ROWS_PER_BAND
                        )
                    ],
                ).alias("key"),
            )
            for k in range(tp.N_BANDS)
        ]
        bands = mh.select(
            "doc_id", F.explode(F.array(*band_structs)).alias("bk")
        ).select("doc_id", "bk.band_id", "bk.key")
        a = bands.alias("a")
        b = bands.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        timed("cands (band self-join + distinct)", lambda: noop(cands))
        full = tp.minhash_lsh_dedup.__wrapped__(spark, sf_dir) \
            if hasattr(tp.minhash_lsh_dedup, "__wrapped__") else None
        from mariadb_columnstore_engine_spark.plans import load_all
        spec = load_all()["text_minhash_lsh_dedup"]
        timed("full query (fresh fn, caches warm)",
              lambda: noop(spec.fn(spark, sf_dir)))
        spark.catalog.clearCache()
        timed("full query (fresh fn, caches cleared)",
              lambda: noop(spec.fn(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
