"""Queries exercising the UDF/UDAF surface (§2.11) and the multimodal
binary-column plumbing.

The pandas UDAF runs through Arrow GROUPED_AGG (distributed partial/merge
like mcsv1_UDAF's nextValue/subEvaluate/evaluate); the multimodal query
runs mapInPandas over binary payloads. Both produce deterministic outputs
so even the Python-path operators stay DuckDB-oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.functions.udf import (
    char_ratio_udf,
    median_udaf,
)
from mariadb_columnstore_engine_spark.operators.multimodal import (
    attach_binary,
    extract_media_features,
    sample_frames,
)
from mariadb_columnstore_engine_spark.plans.registry import query


@query(
    "udf_pandas_median",
    section="§2.11 GROUPED_AGG pandas UDAF (mcsv1_udaf.h contract; "
    "mirrors utils/udfsdk/median.cpp)",
    oracle="""
    SELECT o_orderstatus, round(median(o_totalprice), 4) AS median_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(F.round(median_udaf("o_totalprice"), 4).alias("median_price"))
        .orderBy("o_orderstatus")
    )


@query(
    "udf_pandas_scalar",
    section="§2.11 SCALAR pandas UDF (Arrow-batched row function)",
    oracle="""
    SELECT c_mktsegment,
           round(avg(len(list_distinct(string_split(c_name, '')))
                     * 1.0 / length(c_name)), 6) AS avg_char_ratio
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.select(
            "c_mktsegment", char_ratio_udf("c_name").alias("ratio")
        )
        .groupBy("c_mktsegment")
        .agg(F.round(F.avg("ratio"), 6).alias("avg_char_ratio"))
        .orderBy("c_mktsegment")
    )


@query(
    "multimodal_media_features",
    section="LLM-pipeline: multimodal binary columns — mapInPandas "
    "feature extraction over opaque payloads (deterministic fake decoder; "
    "real Spark plumbing: schema, Arrow batches, partitioning)",
    oracle="""
    SELECT doc_id,
           length(text) AS n_bytes,
           ('0x' || substr(md5(text), 1, 6))::BIGINT AS checksum,
           'fake-deterministic' AS decoder
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    docs = attach_binary(t.documents.where(F.col("doc_id") < 50))
    return extract_media_features(docs).orderBy("doc_id")


@query(
    "udf_apply_in_pandas_zscore",
    section="§2.11 grouped-map applyInPandas (per-group pandas transform; "
    "oracle = window avg/stddev_samp)",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 6) AS z
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_orderstatus)
    ORDER BY o_orderkey
    """,
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.operators.grouped import (
        zscore_by_group,
    )

    t = Catalog(spark, sf_dir)
    scoped = t.orders.where(F.col("o_custkey") < 20).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return (
        zscore_by_group(scoped, "o_orderstatus", "o_totalprice", "z")
        .select("o_orderkey", "o_orderstatus", F.round("z", 6).alias("z"))
        .orderBy("o_orderkey")
    )


@query(
    "udtf_split_sentences",
    section="§2.11 Python UDTF (Spark 4 bonus — the reference has no UDTF "
    "surface, SURVEY §2.11): lateral table function exploding each "
    "document into sentences with per-sentence stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(text, '. ') AS sents
        FROM documents WHERE doc_id < 200
    ),
    tok AS (
        SELECT doc_id,
               generate_subscripts(sents, 1) AS sent_idx,
               unnest(sents) AS sentence
        FROM d
    )
    SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx, sentence,
           CAST(len(string_split(sentence, ' ')) AS INT) AS n_tokens
    FROM tok
    ORDER BY doc_id, sent_idx
    """,
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF built lazily (decorating at import time would need an active
    session for return-type parsing — same pitfall as @pandas_udf)."""
    from pyspark.sql.functions import udtf

    # useArrow: Arrow-batched UDTF execution (ArrowEvalPythonUDTF) —
    # without it Spark runs the UDTF row-at-a-time over pickle
    # (BatchEvalPythonUDTF), the slow path the plan-hygiene suite bans
    @udtf(returnType="sent_idx INT, sentence STRING, n_tokens INT",
          useArrow=True)
    class SplitSentences:
        def eval(self, text):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i + 1, s, len(s.split(" "))

    spark.udtf.register("mcs_split_sentences", SplitSentences)
    t = Catalog(spark, sf_dir)
    t.documents.where(F.col("doc_id") < 200).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_tokens
        FROM _udtf_docs d, LATERAL mcs_split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_idx
        """
    )


@query(
    "multimodal_frame_sample",
    section="LLM-pipeline: multimodal frame sampling — mapInPandas 1→N "
    "row fan-out over opaque binary payloads (deterministic byte-slice "
    "frames standing in for video frame extraction; checksum = portable "
    "24-bit md5 over the frame's hex encoding)",
    oracle="""
    WITH e AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS L
        FROM documents WHERE doc_id < 40
    ),
    f AS (SELECT doc_id, h, L, unnest([0, 1, 2]) AS frame_idx FROM e),
    sliced AS (
        SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
               CAST((frame_idx + 1) * L // 3 - frame_idx * L // 3
                    AS BIGINT) AS frame_bytes,
               substr(h, (frame_idx * L // 3) * 2 + 1,
                      ((frame_idx + 1) * L // 3 - frame_idx * L // 3) * 2)
                   AS frame_hex
        FROM f
    )
    SELECT doc_id, frame_idx, frame_bytes,
           ('0x' || substr(md5(frame_hex), 1, 6))::BIGINT AS frame_checksum
    FROM sliced
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    docs = attach_binary(t.documents.where(F.col("doc_id") < 40))
    return sample_frames(docs, n_frames=3).orderBy("doc_id", "frame_idx")
