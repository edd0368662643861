"""Training-data pipeline operators over ``documents`` (LLM-pipeline
pillar, beyond the reference's own surface).

Three pipeline primitives every corpus build needs, each deterministic
and oracle-checked:

* hash split — stable train/val/test assignment from a salted md5 of the
  document key. No RNG, no shuffle: reproducible across runs, engines,
  and cluster sizes; at 100 TB the split is a map-side projection that
  parquet-writes into three directories.
* mixture weighting — per-source sampling rates applied with the same
  salted-hash construction (hash bucket < rate), the standard way corpus
  mixtures are downsampled without materializing an RNG state.
* quality → dedup → budget — the end-to-end shape: heuristic quality
  gate, exact near-zero-cost fingerprint dedup (min doc_id survives),
  then a per-language token budget enforced with a cumulative-sum window
  (ordered by doc_id so it is deterministic). One shuffle per stage
  (dedup groupBy, budget window) — both on bounded keys.

Hashing portability: 24-bit md5 prefix via the shared _hash24 idiom
(values < 2^48, exact in any engine; see text_plans module docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query


def _bucket(col: Column, salt: str, mod: int) -> Column:
    """Deterministic [0, mod) bucket from a salted 24-bit md5 prefix."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 6), 16, 10)
    return h.cast("long") % mod


def _sql_bucket(expr: str, salt: str, mod: int) -> str:
    return f"('0x' || substr(md5('{salt}' || {expr}), 1, 6))::BIGINT % {mod}"


_SPLIT_SALT = "split-v1"
_MIX_SALT = "mix-v1"
#: per-language mixture rates out of 100 (en downsampled, rest kept/half)
_MIX_RATES = {"en": 40, "de": 100, "es": 50, "fr": 50, "zh": 100}


@query(
    "pipeline_hash_split",
    section="LLM-pipeline: deterministic train/val/test split (90/5/5) "
    "from a salted hash of doc_id — reproducible, RNG-free, map-side",
    oracle=f"""
    WITH d AS (
        SELECT lang, len(string_split(text, ' ')) AS n_tokens,
               {_sql_bucket("CAST(doc_id AS VARCHAR)", _SPLIT_SALT, 100)}
                   AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           count(DISTINCT lang) AS n_langs
    FROM d
    GROUP BY split
    ORDER BY split
    """,
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    bucket = _bucket(F.col("doc_id").cast("string"), _SPLIT_SALT, 100)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise(
            "test"
        )
    )
    return (
        t.documents.select(
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            "lang",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "pipeline_mixture_weights",
    section="LLM-pipeline: corpus mixture weighting — per-language "
    "sampling rates via salted hash bucket < rate (deterministic "
    "downsampling, no RNG state)",
    oracle=f"""
    WITH d AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_tokens,
               {_sql_bucket("CAST(doc_id AS VARCHAR)", _MIX_SALT, 100)}
                   AS bucket,
               CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_RATES.items()))}
                    ELSE 0 END AS rate
        FROM documents
    )
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(sum(CASE WHEN bucket < rate THEN n_tokens ELSE 0 END)
                AS BIGINT) AS sampled_tokens
    FROM d
    GROUP BY lang
    ORDER BY lang
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    bucket = _bucket(F.col("doc_id").cast("string"), _MIX_SALT, 100)
    rate = F.lit(0)
    for k, v in sorted(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    keep = (bucket < rate).cast("long")
    return (
        t.documents.select(
            "lang",
            keep.alias("keep"),
            (keep * F.size(F.split("text", " "))).alias("kept_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").cast("long").alias("n_sampled"),
            F.sum("kept_tokens").cast("long").alias("sampled_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_quality_dedup_budget",
    section="LLM-pipeline: end-to-end corpus build — quality gate "
    "(length / mean-token-length / unique-ratio heuristics), exact "
    "fingerprint dedup (min doc_id survives), per-language token budget "
    "via deterministic cumulative-sum window",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, md5(text) AS fp,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS uniq_ratio,
               length(text) * 1.0 / len(string_split(text, ' '))
                   AS mean_tok_len
        FROM documents
    ),
    quality AS (
        SELECT * FROM scored
        WHERE n_tokens >= 5 AND mean_tok_len < 12 AND uniq_ratio > 0.3
    ),
    dedup AS (
        SELECT * FROM quality
        QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ),
    budgeted AS (
        SELECT lang, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS running
        FROM dedup
    )
    SELECT lang,
           count(*) AS n_docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS budget_tokens
    FROM budgeted
    WHERE running <= 5000
    GROUP BY lang
    ORDER BY lang
    """,
)
def quality_dedup_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    toks = F.split("text", " ")
    scored = t.documents.select(
        "doc_id",
        "lang",
        F.md5("text").alias("fp"),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("uniq_ratio"),
        (F.length("text") / F.size(toks)).alias("mean_tok_len"),
    )
    quality = scored.where(
        (F.col("n_tokens") >= 5)
        & (F.col("mean_tok_len") < 12)
        & (F.col("uniq_ratio") > 0.3)
    )
    dedup = (
        quality.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id")
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    running = F.sum("n_tokens").over(
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dedup.withColumn("running", running)
        .where(F.col("running") <= 5000)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").cast("long").alias("budget_tokens"),
        )
        .orderBy("lang")
    )


#: upsampling rates in hundredths (zh 2.5×, de 1.2×, en 0.4×, ...)
_UP_RATES = {"en": 40, "de": 120, "es": 100, "fr": 150, "zh": 250}


@query(
    "pipeline_mixture_upsample",
    section="LLM-pipeline: mixture weighting with rates > 1 — integer "
    "part replicates every doc, fractional part is hash-gated, so a "
    "2.5× language emits 2 copies of every doc plus a deterministic "
    "half of the corpus a 3rd time. Map-side explode(array_repeat), "
    "no RNG, no shuffle before the audit aggregation",
    oracle=f"""
    WITH d AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_tokens,
               {_sql_bucket("CAST(doc_id AS VARCHAR)", _MIX_SALT, 100)}
                   AS bucket,
               CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_UP_RATES.items()))}
                    ELSE 0 END AS rate
        FROM documents
    ),
    c AS (
        SELECT lang, n_tokens,
               rate // 100
                 + CASE WHEN bucket < rate % 100 THEN 1 ELSE 0 END
                   AS n_copies
        FROM d
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_copies) AS BIGINT) AS n_emitted,
           CAST(sum(n_copies * n_tokens) AS BIGINT) AS emitted_tokens
    FROM c
    GROUP BY lang
    ORDER BY lang
    """,
)
def mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    bucket = _bucket(F.col("doc_id").cast("string"), _MIX_SALT, 100)
    rate = F.lit(0)
    for k, v in sorted(_UP_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    n_copies = (rate / 100).cast("long") + (bucket < rate % 100).cast(
        "long"
    )
    # The materializing form a corpus build would run is
    # explode(array_repeat(struct, n_copies)) — map-side, 0 copies drop
    # the row. The audit below aggregates the copy counts directly so
    # the oracle stays cheap; tests pin that explode agrees.
    return (
        t.documents.select(
            "lang",
            n_copies.alias("n_copies"),
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_copies").cast("long").alias("n_emitted"),
            F.sum(F.col("n_copies") * F.col("n_tokens"))
            .cast("long")
            .alias("emitted_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_stratified_sample",
    section="LLM-pipeline: stratified per-language sampling — exactly k "
    "docs per stratum, selected by rank over the salted hash (RNG-free "
    "uniform-within-stratum choice; reruns, engines and cluster sizes "
    "all agree). One shuffle (the per-stratum window); at 100 TB the "
    "rank prune replaces a global ORDER BY with per-key top-k.",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_sql_bucket("CAST(doc_id AS VARCHAR)",
                                         "sample-v1", 16777216)},
                            doc_id
               ) AS rk
        FROM documents
    )
    SELECT lang, doc_id, n_chars, rk
    FROM ranked
    WHERE rk <= 40
    ORDER BY lang, rk
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    h = _bucket(F.col("doc_id").cast("string"), "sample-v1", 16777216)
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        t.documents.select(
            "lang",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 40)
        .orderBy("lang", "rk")
    )


_CTX = 512  # fixed training-example context length, in whitespace tokens


@query(
    "pipeline_sequence_packing",
    section="LLM-pipeline: deterministic sequence packing — assemble "
    "documents into fixed-context training examples (CTX=512 tokens) "
    "per language shard. A doc joins the example its cumulative token "
    "offset falls in (greedy in-order concat, chunked at CTX), so the "
    "assignment is a pure window cumsum: ONE shuffle on the shard key, "
    "no sequential driver state — the packing recipe sequence-packed "
    "pretraining loaders use, expressed relationally. Examples whose "
    "docs straddle the boundary show tokens > CTX (overflow is counted, "
    "not hidden); at 100 TB each shard packs independently and the "
    "window is bounded per-shard.",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), e AS (
        SELECT lang, n_tokens,
               CAST(floor(COALESCE(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_CTX}.0) AS BIGINT) AS example_id
        FROM d
    ), p AS (
        SELECT lang, example_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS ex_tokens
        FROM e GROUP BY lang, example_id
    )
    SELECT lang,
           count(*) AS n_examples,
           CAST(sum(ex_tokens) AS BIGINT) AS total_tokens,
           CAST(max(n_docs) AS BIGINT) AS max_docs_in_example,
           CAST(sum(CASE WHEN ex_tokens > {_CTX} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overflow_examples
    FROM p GROUP BY lang ORDER BY lang
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    d = t.documents.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    per_example = (
        d.select(
            "lang",
            "n_tokens",
            F.floor(cum_start / _CTX).alias("example_id"),
        )
        .groupBy("lang", "example_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("ex_tokens"),
        )
    )
    return (
        per_example.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.sum("ex_tokens").cast("long").alias("total_tokens"),
            F.max("n_docs").alias("max_docs_in_example"),
            F.sum(
                F.when(F.col("ex_tokens") > _CTX, 1).otherwise(0)
            ).cast("long").alias("n_overflow_examples"),
        )
        .orderBy("lang")
    )


_CHUNK = 32  # tokens per training chunk
_STRIDE = 24  # chunk start step (overlap = _CHUNK - _STRIDE = 8 tokens)


@query(
    "pipeline_chunk_overlap",
    section="LLM-pipeline: overlapping token-window chunking — split each "
    "document into fixed-size training chunks with stride overlap "
    "(sequence + posexplode + slice, all JVM-side; no Python in the path)",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, n,
               unnest(range(1, n + 1, {_STRIDE})) AS start
        FROM d
    )
    SELECT c.doc_id,
           CAST((c.start - 1) / {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(d.toks, c.start,
                               least(c.start + {_CHUNK} - 1, c.n)))
                AS BIGINT) AS chunk_tokens,
           substr(md5(array_to_string(
               list_slice(d.toks, c.start,
                          least(c.start + {_CHUNK} - 1, c.n)), ' ')),
               1, 8) AS chunk_fp
    FROM c JOIN d USING (doc_id)
    ORDER BY doc_id, chunk_id
    """,
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context chunking with overlap (the training-loader prep step).

    Contract: chunks start at token 1, 1+STRIDE, … ≤ n_tokens; each takes
    CHUNK tokens (the last may be short). Every token therefore lands in
    ≥1 chunk and boundary context is preserved by the CHUNK−STRIDE-token
    overlap — the standard sliding-window chunking for LLM pretraining
    and RAG indexing.

    Scale shape: split → sequence → posexplode → slice is entirely
    map-side (no shuffle at all until the output sort, which a real
    pipeline would drop); output size is rows_in × ceil(n/STRIDE), i.e.
    amplification is bounded by CHUNK/STRIDE ≈ 1.3× the token volume.
    Chunks are emitted as an 8-hex fingerprint + token count here to keep
    the gate result narrow; a real run would write the token arrays.
    """
    t = Catalog(spark, sf_dir)
    d = t.documents.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(1), F.col("n"), F.lit(_STRIDE))
        ).alias("chunk_id", "start"),
        F.col("toks"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long"),
        F.slice(F.col("toks"), F.col("start"), _CHUNK).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").cast("long").alias("chunk_tokens"),
        F.substring(F.md5(F.array_join("chunk", " ")), 1, 8).alias(
            "chunk_fp"
        ),
    ).orderBy("doc_id", "chunk_id")


_SHUF_SALT = "shuffle-v1"
_SHUF_SHARDS = 8


@query(
    "pipeline_deterministic_shuffle",
    section="LLM-pipeline: reproducible global training order — salted-"
    "hash shard assignment + within-shard hash ordering; identical on "
    "every run, engine, and cluster size (no RNG state)",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               {_sql_bucket('doc_id', _SHUF_SALT, _SHUF_SHARDS)} AS shard,
               md5('{_SHUF_SALT}-ord' || doc_id) AS ord
        FROM documents
    )
    SELECT shard,
           CAST(row_number() OVER (
                PARTITION BY shard ORDER BY ord) AS BIGINT) AS pos,
           doc_id
    FROM s
    ORDER BY shard, pos
    """,
)
def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-loader shuffle, relationally: global order is
    (shard, within-shard position), both pure functions of the salted
    document key — change the salt, get a fresh epoch permutation.

    Deliberately NOT a global ``Window.orderBy`` (single-reducer trap,
    see SCALE.md): each shard orders independently under a partitioned
    window, which is exactly how sharded data loaders consume order at
    100 TB — shard count scales with the reader fleet, per-shard state
    is bounded, and one hash shuffle is the whole cost.
    """
    t = Catalog(spark, sf_dir)
    s = t.documents.select(
        "doc_id",
        _bucket(F.col("doc_id"), _SHUF_SALT, _SHUF_SHARDS).alias("shard"),
        F.md5(F.concat(F.lit(f"{_SHUF_SALT}-ord"), F.col("doc_id"))).alias(
            "ord"
        ),
    )
    w = Window.partitionBy("shard").orderBy("ord")
    return (
        s.select(
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
            "doc_id",
        )
        .orderBy("shard", "pos")
    )
