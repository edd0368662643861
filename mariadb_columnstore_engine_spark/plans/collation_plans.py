"""Collation-aware comparison / ordering / LIKE (§2.8 + SURVEY §5).

Reference analogue: the engine is collation-serious — every string
compare routes through a charset/collation handler
(utils/common/collation.h wraps the server's CHARSET_INFO; the MTR
matrices mysql-test/columnstore/basic/t/ctype_cmp_*.test pin =, <, LIKE
under latin1_swedish_ci, utf8mb4_general_ci, …). Binary-only comparison
is the immediate user-visible gap for accented / case-folded text.

Spark-first mapping: Spark 4 ships ICU collations natively —
``collate(col, 'UTF8_LCASE')`` makes =, ORDER BY, and LIKE
case-insensitive JVM-side (no UDF, predicate stays codegen'd). The
oracle mirrors with DuckDB's ``lower()`` / ``ILIKE`` which agree with
UTF8_LCASE (= lowercase-then-binary) on the injected charset.

Accent-insensitivity is expressed as explicit fold maps (translate),
identical in both engines, because DuckDB's strip_accents and ICU's AI
collations disagree on some mappings — the pinned contract is the fold
map, which is also what the reference's per-collation weight tables are.

The fixture corpus is pure ASCII, so case/accent variants are derived
deterministically from nation names with the same expressions in both
engines (no synthesized inputs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query

# accent fold map, pinned identically in both engines
_ACC_FROM = "aeiou"
_ACC_TO = "áéíóú"


@query(
    "collation_ci_battery",
    section="§2.8 collation-aware =, ORDER BY, LIKE (utils/common/"
    "collation.h; MTR ctype_cmp_* matrices) — Spark 4 ICU UTF8_LCASE "
    "collation vs DuckDB lower()/ILIKE",
    oracle=f"""
    WITH v AS (
        SELECT n_nationkey,
               upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
                   AS title_name,
               translate(lower(n_name), '{_ACC_FROM}', '{_ACC_TO}')
                   AS accented
        FROM nation
    )
    SELECT n_nationkey, title_name, accented,
           (lower(title_name) = lower((SELECT lower(n_name) FROM nation n2
                WHERE n2.n_nationkey = v.n_nationkey))) AS ci_eq_self,
           title_name ILIKE '%an%'                      AS ci_like_an,
           title_name ILIKE 'c%'                        AS ci_starts_c,
           (translate(accented, '{_ACC_TO}', '{_ACC_FROM}')
                = lower(title_name))                    AS ai_eq_folded,
           CAST(row_number() OVER (
                ORDER BY lower(title_name), title_name) AS BIGINT)
               AS ci_rank
    FROM v
    ORDER BY n_nationkey
    """,
)
def collation_ci_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    title = F.concat(
        F.upper(F.substring("n_name", 1, 1)),
        F.lower(F.expr("substr(n_name, 2)")),
    )
    accented = F.translate(F.lower(F.col("n_name")), _ACC_FROM, _ACC_TO)
    v = t.nation.select(
        "n_nationkey",
        title.alias("title_name"),
        accented.alias("accented"),
    )
    # ICU case-insensitive collation: =, LIKE and ORDER BY all route
    # through the collation JVM-side (no lower() rewrite needed in the
    # predicate — Catalyst keeps it codegen'd and pushable)
    ci = F.collate(F.col("title_name"), "UTF8_LCASE")
    w = Window.orderBy(ci, F.col("title_name"))
    return v.select(
        "n_nationkey",
        "title_name",
        "accented",
        (ci == F.collate(F.lower("title_name"), "UTF8_LCASE")).alias(
            "ci_eq_self"
        ),
        ci.like("%AN%").alias("ci_like_an"),
        ci.like("C%").alias("ci_starts_c"),
        (
            F.translate(F.col("accented"), _ACC_TO, _ACC_FROM)
            == F.lower(F.col("title_name"))
        ).alias("ai_eq_folded"),
        F.row_number().over(w).cast("long").alias("ci_rank"),
    ).orderBy("n_nationkey")


@query(
    "collation_ci_ai_battery",
    section="§2.8 accent-AND-case-insensitive collation (utils/common/"
    "collation.h locale collations; MTR ctype_cmp_* accent matrices, "
    "e.g. utf8mb4_unicode_ci which folds accents) — Spark 4 ICU "
    "UNICODE_CI_AI for =, GROUP BY keys and ORDER BY vs a DuckDB "
    "strip_accents+lower fold. ICU LIKE is not defined for AI "
    "collations in Spark (UTF8_LCASE covers CI LIKE in "
    "collation_ci_battery); the remaining surfaces are pinned here. "
    "Restricted to the áéíóú accent set where ICU AI folding and "
    "DuckDB strip_accents provably agree.",
    oracle=f"""
    WITH v AS (
        SELECT n_nationkey, n_name,
               translate(lower(n_name), '{_ACC_FROM}', '{_ACC_TO}')
                   AS accented,
               upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
                   AS title_name
        FROM nation
    ), u AS (
        SELECT n_nationkey, accented AS s FROM v
        UNION ALL SELECT n_nationkey, title_name FROM v
        UNION ALL SELECT n_nationkey, upper(n_name) FROM v
    )
    SELECT n_nationkey,
           min(strip_accents(lower(s))) AS folded,
           CAST(count(*) AS BIGINT) AS n_variants,
           bool_and(strip_accents(lower(s))
                    = (SELECT lower(n_name) FROM nation n2
                       WHERE n2.n_nationkey = u.n_nationkey))
               AS ai_ci_eq_all,
           CAST(dense_rank() OVER (
                ORDER BY min(strip_accents(lower(s)))) AS BIGINT)
               AS ai_ci_rank
    FROM u
    GROUP BY n_nationkey
    ORDER BY n_nationkey
    """,
)
def collation_ci_ai_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three accent/case variants per nation (accented-lower, Title,
    UPPER) must collapse to ONE group under the UNICODE_CI_AI key, test
    equal to the canonical name under the collation, and rank in folded
    alphabetical order — =, GROUP BY and ORDER BY all routed through
    the ICU collation JVM-side."""
    t = Catalog(spark, sf_dir)
    accented = F.translate(F.lower(F.col("n_name")), _ACC_FROM, _ACC_TO)
    title = F.concat(
        F.upper(F.substring("n_name", 1, 1)),
        F.lower(F.expr("substr(n_name, 2)")),
    )
    v = t.nation.select("n_nationkey", "n_name", accented.alias("acc"),
                        title.alias("tit"))
    u = (
        v.select("n_nationkey", "n_name", F.col("acc").alias("s"))
        .unionAll(v.select("n_nationkey", "n_name", F.col("tit").alias("s")))
        .unionAll(v.select("n_nationkey", "n_name",
                           F.upper("n_name").alias("s")))
    )
    ai = F.collate(F.col("s"), "UNICODE_CI_AI")
    grouped = (
        u.groupBy("n_nationkey")
        .agg(
            # one CI_AI-distinct value per group proves the three
            # variants are equal under the collation; surface the
            # explicit fold for the oracle
            F.min(F.translate(F.lower("s"), _ACC_TO, _ACC_FROM)).alias(
                "folded"
            ),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            # collated equality: every variant == canonical lower name
            F.min(
                (ai == F.collate(F.lower("n_name"), "UNICODE_CI_AI"))
                .cast("int")
            ).cast("boolean").alias("ai_ci_eq_all"),
        )
    )
    w = Window.orderBy(F.collate(F.col("folded"), "UNICODE_CI_AI"))
    return grouped.select(
        "n_nationkey",
        F.col("folded").cast("string").alias("folded"),
        "n_variants",
        "ai_ci_eq_all",
        F.dense_rank().over(w).cast("long").alias("ai_ci_rank"),
    ).orderBy("n_nationkey")


@query(
    "collation_ci_join_group",
    section="§2.8 collation in join keys + grouping (collation.h "
    "CHARSET_INFO-driven hash/compare in joins and aggregation; MTR "
    "ctype_* join cases) — UTF8_LCASE group-by key vs DuckDB lower()",
    oracle="""
    WITH c AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg_mixed,
               c_acctbal
        FROM customer
    )
    SELECT lower(seg_mixed) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 2)
               AS total_bal
    FROM c
    GROUP BY lower(seg_mixed)
    ORDER BY segment
    """,
)
def collation_ci_join_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-case group keys must collapse under a CI collation: half the
    customers get an uppercased segment, half lowercased; grouping on the
    UTF8_LCASE-collated key yields exactly the 5 canonical segments."""
    t = Catalog(spark, sf_dir)
    seg_mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    c = t.customer.select(seg_mixed.alias("seg_mixed"), cents.alias("cents"))
    # group on the collated key; emit the canonical (lowercased) form
    return (
        c.groupBy(F.collate(F.col("seg_mixed"), "UTF8_LCASE").alias("_k"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_bal"),
        )
        .select(
            F.lower(F.col("_k")).cast("string").alias("segment"),
            "n_customers",
            "total_bal",
        )
        .orderBy("segment")
    )


# locale-injected characters, cycled deterministically by nationkey so
# the ASCII fixture corpus exercises each tailoring class
_DA_CHARS = ("å", "æ", "ø", "a", "z")
_DE_CHARS = ("ä", "a", "ö", "o", "z", "p")


@query(
    "collation_locale_battery",
    section="§2.8 locale-tailored collations (utils/common/collation.h "
    "per-locale weight tables; MTR ctype_cmp_* locale matrices — "
    "Turkish dotless-i, German ä/ö umlauts, Nordic å/æ/ø) — Spark 4 "
    "ICU locale collations tr_CI / de / da. Ordering is pinned engine-"
    "vs-engine (DuckDB ships the same ICU tailorings: 'å' sorts after "
    "'z' under da, 'ö' adjacent to 'o' under de); Turkish equality is "
    "pinned against an explicit fold contract (DuckDB's tr.nocase is a "
    "plain lowercase fold, NOT ICU Turkish CI, so 'I' = 'i' there — "
    "the CASE/contains spellings below are the Turkish-correct truth "
    "the reference's tr collation weight table encodes: upper('i') is "
    "'İ', upper('ı') is 'I').",
    oracle="""
    WITH v AS (
        SELECT n_nationkey,
               lower(n_name) AS base,
               replace(lower(n_name), 'i', 'İ') AS dotted,
               (['å','æ','ø','a','z'])[(n_nationkey % 5) + 1]
                   || lower(n_name) AS da_key,
               (['ä','a','ö','o','z','p'])[(n_nationkey % 6) + 1]
                   || lower(n_name) AS de_key
        FROM nation
    )
    SELECT n_nationkey, base,
           -- tr_CI: dotted-İ folds to i, so the İ-injected variant
           -- always equals the base (fold contract)
           (replace(dotted, 'İ', 'i') = base) AS tr_dotted_eq,
           -- tr_CI: ASCII 'I' folds to DOTLESS ı, never to i — so
           -- UPPER(name) = lower(name) holds iff the name has no i
           (NOT contains(base, 'i')) AS tr_upper_eq,
           -- distinct tr_CI equivalence classes among {base, İ-variant,
           -- I-variant}: the I-variant splits off iff an i exists
           CAST(CASE WHEN contains(base, 'i') THEN 2 ELSE 1 END
               AS BIGINT) AS n_tr_classes,
           CAST(row_number() OVER (ORDER BY da_key COLLATE da, da_key)
               AS BIGINT) AS da_rank,
           CAST(row_number() OVER (ORDER BY de_key COLLATE de, de_key)
               AS BIGINT) AS de_rank
    FROM v
    ORDER BY n_nationkey
    """,
)
def collation_locale_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locale-tailored =, ORDER BY and DISTINCT: Turkish tr_CI equality
    (İ=i but I≠i), Danish ordering (å/æ/ø collate after z) and German
    ordering (ä/ö collate with a/o) all routed through Spark's ICU
    locale collations JVM-side. Scale note: the rank windows are
    unpartitioned but run over the constant 25-row nation dim — at
    100 TB locale keys live on dimension-sized domains; fact-side use
    is the GROUP BY path (collation_ci_join_group shape)."""
    t = Catalog(spark, sf_dir)
    base = F.lower(F.col("n_name"))
    v = t.nation.select(
        "n_nationkey",
        base.alias("base"),
        F.replace(base, F.lit("i"), F.lit("İ")).alias("dotted"),
        F.replace(base, F.lit("i"), F.lit("I")).alias("dotless_cap"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(c) for c in _DA_CHARS]),
                (F.col("n_nationkey") % 5 + 1).cast("int"),
            ),
            base,
        ).alias("da_key"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(c) for c in _DE_CHARS]),
                (F.col("n_nationkey") % 6 + 1).cast("int"),
            ),
            base,
        ).alias("de_key"),
        F.upper(F.col("n_name")).alias("up"),
    )
    tr = lambda c: F.collate(c, "tr_CI")  # noqa: E731
    w_da = Window.orderBy(F.collate(F.col("da_key"), "da"), F.col("da_key"))
    w_de = Window.orderBy(F.collate(F.col("de_key"), "de"), F.col("de_key"))
    return v.select(
        "n_nationkey",
        "base",
        (tr(F.col("dotted")) == tr(F.col("base"))).alias("tr_dotted_eq"),
        (tr(F.col("up")) == tr(F.col("base"))).alias("tr_upper_eq"),
        F.size(
            F.array_distinct(
                F.array(
                    tr(F.col("base")),
                    tr(F.col("dotted")),
                    tr(F.col("dotless_cap")),
                )
            )
        ).cast("long").alias("n_tr_classes"),
        F.row_number().over(w_da).cast("long").alias("da_rank"),
        F.row_number().over(w_de).cast("long").alias("de_rank"),
    ).orderBy("n_nationkey")


@query(
    "collation_column_ddl",
    section="§2.8 per-column declared collation DDL (ddl.y column "
    "attributes → utils/common/collation.h CHARSET_INFO; "
    "basic/t/ctype_cmp_* matrices declare collations in CREATE TABLE): "
    "a column declared COLLATE utf8mb4_unicode_ci at CREATE TABLE time "
    "groups, compares and orders case-insensitively on every "
    "subsequent query — the collation is applied on READ from the "
    "table's sidecar (sources/ingest.py read_table_evolved), not by "
    "per-query wrappers. Mixed-case rows are derived deterministically "
    "from customer (UPPER / lower / Title by custkey mod 3) through "
    "the engine's own DML, then grouped on the declared-CI column.",
    oracle="""
    WITH v AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
                    WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
                    ELSE upper(substr(c_mktsegment, 1, 1))
                         || lower(substr(c_mktsegment, 2)) END AS seg,
               CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer
    )
    SELECT lower(seg) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents_sum,
           CAST(sum(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_building_ci
    FROM v
    GROUP BY lower(seg)
    ORDER BY segment
    """,
)
def collation_column_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end DDL gate: CREATE TABLE … COLLATE utf8mb4_unicode_ci →
    INSERT mixed-case rows via the engine's DML → plain GROUP BY /
    equality over the declared-CI column collapse case variants with NO
    query-side collate() call (the sidecar supplies it). The oracle
    derives the same aggregates in DuckDB with an explicit lower()
    fold, independent of the engine's collation machinery.

    Scale: one scan of customer + one CI hash-agg; the DDL/INSERT leg
    is a fixed per-run setup cost, not part of the measured shape."""
    import tempfile

    from mariadb_columnstore_engine_spark.engine import Engine

    eng = Engine(
        spark, sf_dir,
        warehouse=tempfile.mkdtemp(prefix="mcs_coll_ddl_"),
    )
    eng.execute(
        "CREATE TABLE coll_ddl_seg ("
        " c_custkey BIGINT,"
        " seg VARCHAR(20) COLLATE utf8mb4_unicode_ci,"
        " cents BIGINT)"
    )
    eng.execute(
        "INSERT INTO coll_ddl_seg"
        " SELECT c_custkey,"
        " CASE WHEN c_custkey % 3 = 0 THEN UPPER(c_mktsegment)"
        "      WHEN c_custkey % 3 = 1 THEN LOWER(c_mktsegment)"
        "      ELSE CONCAT(UPPER(SUBSTR(c_mktsegment, 1, 1)),"
        "                  LOWER(SUBSTR(c_mktsegment, 2))) END,"
        " CAST(ROUND(c_acctbal * 100, 0) AS SIGNED)"
        " FROM customer"
    )
    # no collate() anywhere below: the declared collation does the work
    return eng.sql(
        "SELECT CAST(LOWER(seg) AS CHAR) AS segment,"
        " COUNT(*) AS n_customers,"
        " SUM(cents) AS cents_sum,"
        " SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)"
        "   AS n_building_ci"
        " FROM coll_ddl_seg GROUP BY seg ORDER BY segment"
    )


@query(
    "collation_pad_space_semantics",
    section="§2.8 PAD SPACE vs NOPAD collation semantics (r6 — the "
    "ctype_cmp_*_nopad_* half of the MTR matrix: "
    "mysql-test/columnstore/basic/t/ctype_cmp_varchar32_utf8_general_ci"
    ".test vs ..._nopad_ci.test; utils/common/collation.h wraps the "
    "server handlers whose PAD variants ignore trailing spaces in "
    "comparison while LIKE stays trailing-space-significant). "
    "Spark-first: Spark 4 ships trim-sensitive ICU collations — "
    "UTF8_BINARY_RTRIM / UTF8_LCASE_RTRIM make =, GROUP BY and "
    "DISTINCT honor PAD semantics JVM-side (codegen, no rtrim() "
    "rewrite in user queries); the NOPAD variants are the plain "
    "collations. The oracle expresses the same contract with explicit "
    "rtrim()/lower() folds. Four variants per nation name (raw, "
    "+1 space, +2 spaces, title-case +1 space) pin the group-count "
    "matrix: PAD_CI=1, PAD_BIN=2, NOPAD_CI=3, NOPAD_BIN=4; equality "
    "'a ' = 'a' holds under PAD, while LIKE (always NOPAD in MariaDB) "
    "rejects the trailing space.",
    oracle="""
    WITH v AS (
        SELECT n_name, n_name AS s FROM nation
        UNION ALL SELECT n_name, n_name || ' ' FROM nation
        UNION ALL SELECT n_name, n_name || '  ' FROM nation
        UNION ALL SELECT n_name,
               upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
                   || ' '
        FROM nation
    )
    SELECT n_name,
           CAST(count(DISTINCT lower(rtrim(s))) AS BIGINT)
               AS pad_ci_groups,
           CAST(count(DISTINCT rtrim(s)) AS BIGINT)
               AS pad_bin_groups,
           CAST(count(DISTINCT lower(s)) AS BIGINT)
               AS nopad_ci_groups,
           CAST(count(DISTINCT s) AS BIGINT)
               AS nopad_bin_groups,
           (min(CASE WHEN rtrim(n_name || ' ') = rtrim(n_name)
                     THEN 1 ELSE 0 END) = 1) AS pad_eq_trailing,
           (max(CASE WHEN (n_name || ' ') LIKE n_name
                     THEN 1 ELSE 0 END) = 1) AS like_trailing
    FROM v
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def collation_pad_space_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = Catalog(spark, sf_dir)
    title = F.concat(
        F.upper(F.substring("n_name", 1, 1)),
        F.lower(F.expr("substr(n_name, 2)")),
    )
    base = t.nation.select("n_name")
    v = (
        base.select("n_name", F.col("n_name").alias("s"))
        .unionAll(
            base.select(
                "n_name", F.concat("n_name", F.lit(" ")).alias("s")
            )
        )
        .unionAll(
            base.select(
                "n_name", F.concat("n_name", F.lit("  ")).alias("s")
            )
        )
        .unionAll(
            base.select(
                "n_name", F.concat(title, F.lit(" ")).alias("s")
            )
        )
    )
    pad_eq = (
        F.collate(F.concat("n_name", F.lit(" ")), "UTF8_BINARY_RTRIM")
        == F.collate(F.col("n_name"), "UTF8_BINARY_RTRIM")
    )
    # LIKE is NOPAD even under PAD collations (MariaDB): the raw
    # column is compared, trailing space significant
    like_eq = F.expr("concat(n_name, ' ') LIKE n_name")
    return (
        v.groupBy("n_name")
        .agg(
            F.countDistinct(
                F.collate("s", "UTF8_LCASE_RTRIM")
            ).alias("pad_ci_groups"),
            F.countDistinct(
                F.collate("s", "UTF8_BINARY_RTRIM")
            ).alias("pad_bin_groups"),
            F.countDistinct(F.collate("s", "UTF8_LCASE")).alias(
                "nopad_ci_groups"
            ),
            F.countDistinct("s").alias("nopad_bin_groups"),
            F.min(pad_eq).alias("pad_eq_trailing"),
            F.max(like_eq).alias("like_trailing"),
        )
        .orderBy("n_name")
    )
