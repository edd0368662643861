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
