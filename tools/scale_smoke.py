"""Scale smoke: run the dedup family on an amplified corpus.

Amplifies ``documents`` by COPIES (doc_id-offset replicas → every
original becomes an exact-duplicate cluster, the worst case for
candidate generation) and times exact dedup, MinHash LSH, and the
df-capped n-gram Jaccard miner at the larger cardinality. This probes
the claims SCALE.md makes — candidate generation stays bounded as the
corpus grows — with measured numbers rather than assertions.

Usage: python tools/scale_smoke.py [sf_dir] [copies]
Prints one JSON line: {"n_docs": ..., "copies": ..., "queries": {...}}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from mariadb_columnstore_engine_spark.plans import load_all
    from mariadb_columnstore_engine_spark.session import get_session

    # Local mode hosts driver + all executor threads in ONE heap; the
    # engine's 64 MB broadcast threshold assumes a real driver heap, so
    # size it like bench.py does (the default 1g OOMs broadcasting the
    # amplified doc tables).
    spark = get_session(
        "scale-smoke",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    offset = 10 ** len(str(n_base * copies))
    amplified = base.crossJoin(
        spark.range(copies).select(F.col("id").alias("_copy"))
    ).select(
        (F.col("doc_id") + F.col("_copy") * offset).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    amp_dir = f"{tmp}/amplified"
    amplified.write.mode("overwrite").parquet(f"{amp_dir}/documents.parquet")
    # satisfy the Catalog contract for the other tables (unused by the
    # text queries, but the loader resolves paths lazily so only
    # documents.parquet must exist)

    specs = load_all()
    names = [
        "text_fingerprint_exact_dedup",
        "text_minhash_lsh_dedup",
        "text_ngram_jaccard_pairs",
    ]
    out = {}
    for name in names:
        t0 = time.time()
        n = specs[name].fn(spark, amp_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "n_docs": n_base * copies,
                "copies": copies,
                "queries": out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
