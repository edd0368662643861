"""Similarity/LSH scale probe (VERDICT r8 #7): the two headline
families without a second measured scaling point — banded-MinHash LSH
dedup (text_minhash_lsh_dedup) and IVF ANN top-k (sim_ivf_ann_topk) —
timed at two fixture scales through Spark's noop sink (execution-only;
the r8 probe measured collect()-timing inflating a 9.5M-row result
25x, so scale probes never collect).

The claims under test (SCALE.md):
  - LSH dedup is linear-ish in corpus size: band-key equi-join +
    doc_id< candidate pruning, never all-pairs. The synthetic corpus
    duplicates documents ~100x, so the scaled fixture's PAIR count
    grows ~quadratically in the replica factor — wall-clock must track
    the pair count sublinearly, not the doc count.
  - IVF ANN is linear in corpus size for a FIXED probe set: constant
    centroid broadcast, bucket equi-join; doubling vectors ~doubles
    the probed-bucket scan.

Usage: python tools/similarity_scale_probe.py [small_dir] [big_dir]
Defaults: .fixtures/sf1 .fixtures/sf10 (tools/gen_sf_scale.py output).
Prints one JSON line with per-scale medians of 2 runs (+1 count run
for the result-row sanity figure).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

QUERIES = ("text_minhash_lsh_dedup", "sim_ivf_ann_topk")


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/sf1"
    big = sys.argv[2] if len(sys.argv) > 2 else ".fixtures/sf10"

    from mariadb_columnstore_engine_spark.plans import load_all
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session(
        "similarity-scale-probe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()

    out: dict = {"queries": {}}
    for sf_label, sf_dir in (("small", small), ("big", big)):
        ndocs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        nvecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        out[f"{sf_label}_docs"] = ndocs
        out[f"{sf_label}_vecs"] = nvecs
        for name in QUERIES:
            times = []
            rows = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                df = qs[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
                if rows is None:
                    rows = df.count()
            out["queries"].setdefault(name, {})[sf_label] = {
                "median_s": round(statistics.median(times), 2),
                "runs": [round(t, 2) for t in times],
                "result_rows": rows,
            }
    for name, d in out["queries"].items():
        d["ratio_big_over_small"] = round(
            d["big"]["median_s"] / d["small"]["median_s"], 2
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
