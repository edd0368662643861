"""Classify mtr_probe.py's --dump buckets for COVERAGE.md triage.

Groups the duck-only (spark refused / errored) and neither-parsed
statements by refusal reason so each distinct spelling can be
adjudicated: missing dialect rewrite (fix) vs correctly-refused
MariaDB-ism (document). See VERDICT r6 #3.

Usage: python tools/mtr_triage.py /tmp/mtr_buckets.json
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter, defaultdict

#: (pattern over the spark error text, short triage label)
_CLASSES = [
    (r"TimeoutError|exceeded \d+s", "probe-timeout (cartesian shape cap)"),
    (r"PARSE_SYNTAX_ERROR", "spark parse error"),
    (r"UNRESOLVED_COLUMN", "unresolved column"),
    (r"UNRESOLVED_ROUTINE|undefined function", "unknown function"),
    (r"row-order-dependent|unique key", "refused: row-order-dependent DML"),
    (r"DATATYPE_MISMATCH|CAST_INVALID|cannot be cast", "type mismatch"),
    (r"MISSING_AGGREGATION|GROUP_BY", "group-by semantics"),
    (r"Division by zero", "division semantics"),
    (r"ambiguous", "ambiguous reference"),
    (r"ValueError", "engine refusal (ValueError)"),
]


def classify(err: str | None) -> str:
    e = err or ""
    for pat, label in _CLASSES:
        if re.search(pat, e, re.IGNORECASE):
            return label
    return "other"


#: spark-only bucket: MariaDB SPELLING families DuckDB cannot parse,
#: each mapped to the oracle-checked registry row(s) (or pytest
#: surface) that carries that spelling through a DuckDB-checkable
#: equivalent — the audit VERDICT r7 #4 asked for. First match wins;
#: (family, sql-regex, coverage evidence). A family whose evidence is
#: "NONE" must either gain a gate row or a documented refusal.
SPELLING_FAMILIES: list[tuple[str, str, str]] = [
    ("index hints USE/FORCE/IGNORE INDEX|KEY",
     r"\b(?:USE|FORCE|IGNORE)\s+(?:INDEX|KEY)\b",
     "sql_index_hint_collate_binary (r8 gate row)"),
    ("inline COLLATE / charset introducers",
     r"\bCOLLATE\b|_utf8|_latin1",
     "sql_index_hint_collate_binary + collation_* battery rows"),
    ("unary BINARY operator",
     r"\bBINARY\s+[\w`(']",
     "sql_index_hint_collate_binary (r8 gate row)"),
    ("SELECT options (SQL_NO_CACHE/SQL_CALC_FOUND_ROWS/...)",
     r"\bSQL_(?:NO_CACHE|CACHE|CALC_FOUND_ROWS|SMALL_RESULT"
     r"|BIG_RESULT|BUFFER_RESULT)\b|\bHIGH_PRIORITY\b",
     "sqltrans option strip + test_sql_calc_found_rows"),
    ("STRAIGHT_JOIN",
     r"\bSTRAIGHT_JOIN\b",
     "sqltrans strip; join rows tpch_q3/q5/q10 carry the join shapes"),
    ("PROCEDURE ANALYSE trailer",
     r"\bPROCEDURE\s+ANALYSE\b",
     "test_procedure_analyse (router relation)"),
    ("MariaDB cast targets (SIGNED/UNSIGNED/CHAR/BINARY/DATETIME)",
     r"\bCAST\s*\([^)]*\bAS\s+(?:SIGNED|UNSIGNED|CHAR\b|BINARY"
     r"|DATETIME|DATE\b|TIME\b)|\bCONVERT\s*\(",
     "sql_mariadb_front_end3 (CONVERT + cast-target matrix), "
     "sf_conditional_cast_matrix"),
    ("IF()/IFNULL()/ISNULL() conditionals",
     r"\bIF\s*\(|\bIFNULL\s*\(|\bISNULL\s*\(",
     "sf_conditional_cast_matrix, sql_mariadb_front_end4"),
    ("GROUP_CONCAT (SEPARATOR/ORDER BY/DISTINCT forms)",
     r"\bGROUP_CONCAT\s*\(",
     "agg_group_concat_distinct, agg_group_concat_ordered"),
    ("MariaDB date/time functions",
     r"\b(?:DATE_FORMAT|STR_TO_DATE|TIME_FORMAT|ADDDATE|SUBDATE"
     r"|ADDTIME|SUBTIME|PERIOD_ADD|PERIOD_DIFF|TO_DAYS|FROM_DAYS"
     r"|TO_SECONDS|SEC_TO_TIME|TIME_TO_SEC|MAKEDATE|MAKETIME"
     r"|YEARWEEK|WEEKOFYEAR|DAYOFYEAR|DAYOFMONTH|DAYOFWEEK|WEEKDAY"
     r"|TIMESTAMPADD|TIMESTAMPDIFF|GET_FORMAT|CONVERT_TZ|CURDATE"
     r"|CURTIME|SYSDATE|UTC_DATE|UTC_TIME|UTC_TIMESTAMP"
     r"|UNIX_TIMESTAMP|FROM_UNIXTIME|LAST_DAY|MICROSECOND"
     r"|WEEK|MONTHNAME|DAYNAME|QUARTER)\s*\(",
     "sf_datetime_matrix, sf_datetime_matrix2/3, sf_week_modes, "
     "sql_mariadb_front_end2 (WEEK/YEARWEEK bridge)"),
    ("MariaDB string functions",
     r"\b(?:SUBSTRING_INDEX|LCASE|UCASE|MID|LOCATE|ELT|FIELD"
     r"|FIND_IN_SET|EXPORT_SET|MAKE_SET|INSERT|CHAR|ORD"
     r"|CONV|OCT|QUOTE|SPACE|HEX|UNHEX|BIT_COUNT|STRCMP|SOUNDEX"
     r"|COMPRESS|UNCOMPRESS)\s*\(",
     "sf_string_matrix / sf_string_matrix2/3, sql_mariadb_front_end4"),
    ("JSON_* functions",
     r"\bJSON_\w+\s*\(",
     "sf_json_* rows (6 driver-green) + sql_json_table"),
    ("TRUNCATE(x,d)-wrapped window-function batteries "
     "(mcs6178-6205: CORR/REGR_*/STDDEV/VAR over frames) — since r10 "
     "duck_dialect renders TRUNCATE as the engine's own decimal "
     "remainder-strip, so these are VALUE-CHECKED both-parsed rows; "
     "only statements failing DuckDB for OTHER reasons remain here",
     r"\bTRUNCATE\s*\(.*\bOVER\s*\(",
     "win_corr_running_null_semantics, win_regr_over_partition, "
     "win_stats_over_partition, win_range_frame_value_offset "
     "(+ TRUNCATE vectors tests/test_sqltrans.py)"),
    ("STD()/VARIANCE() spellings (mcs6210 window battery)",
     r"\b(?:STD|VARIANCE)\s*\(",
     "agg_stddev_variance (STD = STDDEV_POP alias), "
     "win_stats_over_partition"),
    ("PERCENTILE_CONT/DISC WITHIN GROUP .. OVER",
     r"\bPERCENTILE_(?:CONT|DISC)\s*\(",
     "win_percentiles_within_group"),
    ("string-fn numeric-arg coercion (md5/reverse/sha of numbers — "
     "r9: Item_str_func string read; DuckDB has no such coercion)",
     r"\b(?:MD5|SHA1?|SHA2|REVERSE)\s*\(\s*[\w.]*(?:key|\d)",
     "tests/test_sqltrans.py::test_string_fn_numeric_coercion "
     "(md5/sha1/sha2/reverse numeric args; mcs7092 twin)"),
    ("FORMAT(x, d) thousands-separator rendering "
     "(r9: loose value-arg read; DuckDB's format() is printf-style)",
     r"\bFORMAT\s*\(",
     "tests/test_sqltrans.py::test_format_stringish_arg + mcs7088 "
     "both-parsed twins"),
    ("string column/name as numeric-fn arg or bare boolean operand "
     "(r9 loose coercion: round(r_name,2), ON (b.n_name AND ...))",
     r"\bROUND\s*\(\s*\w*name|\bAND\b\s*\w+\s*\.\s*\w*name\b"
     r"|\(\s*\w+\s*\.\s*\w*name\s+AND\b",
     "sql_loose_coercion_contexts (r9 gate row) + "
     "tests/test_sqltrans.py loose-arg vectors"),
    ("math/crypto long tail (TRUNCATE scalar/CRC32/...)",
     r"\b(?:TRUNCATE|CRC32|MD5|SHA1?|SHA2|LOG2|LOG10|COT|RADIANS"
     r"|DEGREES|PI)\s*\(",
     "sf_math_matrix, sf_oracle_mode_dialect"),
    ("aggregate long tail (BIT_AND/OR/XOR, MODA)",
     r"\b(?:BIT_AND|BIT_OR|BIT_XOR|STDDEV_POP|STDDEV_SAMP"
     r"|VAR_POP|VAR_SAMP|MODA)\s*\(",
     "agg_bit_ops, agg_stddev_variance, agg_moda"),
    ("loose numeric<->string coercion (substr/arith on numbers, "
     "int x bool)",
     r"\bSUBSTR\s*\(\s*\w+key|\bSUBSTR\s*\(\s*[a-z]_\w*price"
     r"|\bSUBSTR\s*\(\s*[a-z]_(?:nationkey|name)\s*,\s*ROUND"
     r"|\*\s*\(\s*\w+\s*[<>=]|SUBSTR\s*\(\s*\w+\s*,\s*\d+\s*,"
     r"\s*\d+\s*\)\s*\+\s*0",
     "sqltrans bool/int + loose-cast repairs (mcs7010/7566/7567 "
     "families; the both-parsed twins are exact-match)"),
    ("C-style boolean ops (&&, ||-as-or via sql_mode, <=>)",
     r"&&|<=>|\bXOR\b|!\s*[\w(]",
     "filter_compound_boolean_tree (boolean trees), sqltrans "
     "truthiness repairs (mcs7116/7173 exact in both-parsed)"),
    ("REGEXP / RLIKE / SOUNDS LIKE",
     r"\bREGEXP\b|\bRLIKE\b|\bSOUNDS\s+LIKE\b",
     "filter_like_patterns (pattern family), sf_string_matrix3"),
    ("hex/bit literals (0x.., X'..', b'..')",
     r"\b0x[0-9a-fA-F]+|\bX'[0-9a-fA-F]*'|\bb'[01]+'",
     "sf_string_matrix2 (hex rendering)"),
    ("backtick-quoted identifiers",
     r"`",
     "every gate row runs through the mask-aware translation "
     "(sqltrans strips backticks; tests/test_sqltrans.py)"),
    ("double-quoted string literals",
     r'"',
     "sql_mariadb_front_end (double-quoted alias/literal positions, "
     "mcs7096)"),
    ("DIV integer division / MOD spelling",
     r"\bDIV\b|\bMOD\b",
     "sf_oracle_mode_dialect (DIV), sf_math_matrix (MOD)"),
    ("LIMIT offset,count form",
     r"\bLIMIT\s+\d+\s*,\s*\d+",
     "setop_distinct_limit_offset + sqltrans offset-comma rewrite"),
]


def classify_spelling(sql: str) -> tuple[str, str]:
    for fam, pat, cov in SPELLING_FAMILIES:
        if re.search(pat, sql, re.IGNORECASE):
            return fam, cov
    return "OTHER (unclassified)", "NONE"


def spark_only_audit(rows: list[dict]) -> None:
    """COVERAGE.md-ready audit table: spelling family -> count ->
    covering registry evidence. Families classifying to NONE demand a
    new gate row or documented refusal (VERDICT r7 #4)."""
    groups: dict[str, list] = defaultdict(list)
    cover: dict[str, str] = {}
    for r in rows:
        fam, cov = classify_spelling(r["sql"])
        groups[fam].append(r)
        cover[fam] = cov
    print("\n| spelling family | count | oracle'd coverage |")
    print("|---|---|---|")
    for fam, rs in sorted(groups.items(), key=lambda kv: -len(kv[1])):
        print(f"| {fam} | {len(rs)} | {cover[fam]} |")
    uncl = groups.get("OTHER (unclassified)", [])
    if uncl:
        print(f"\n-- unclassified examples ({len(uncl)}):")
        for r in uncl[:25]:
            print(f"   [{r['src']}] {r['sql'][:160]}")
        tails = Counter(
            (r.get("duck_err") or "?").split("\n")[0][:120]
            for r in uncl
        )
        for t, n in tails.most_common(10):
            print(f"   {n:4d}x {t}")


#: the REFERENCE's dbt3/TPC-H table widths (mysql-test/columnstore
#: fixture schemas) — statements naming these columns run there; our
#: parquet fixtures carry a column subset, so a neither-bucket error
#: that names one of THESE columns (absent from /root/testdata) is a
#: FIXTURE GAP, not an engine gap (VERDICT r8 #4: adjudicate each).
REFERENCE_COLUMNS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey", "r_name", "r_comment"),
    "nation": ("n_nationkey", "n_name", "n_regionkey", "n_comment"),
    "customer": (
        "c_custkey", "c_name", "c_address", "c_nationkey", "c_phone",
        "c_acctbal", "c_mktsegment", "c_comment",
    ),
    "orders": (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
        "o_comment",
    ),
    "lineitem": (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate", "l_commitdate",
        "l_receiptdate", "l_shipinstruct", "l_shipmode", "l_comment",
    ),
    "supplier": (
        "s_suppkey", "s_name", "s_address", "s_nationkey", "s_phone",
        "s_acctbal", "s_comment",
    ),
    "part": (
        "p_partkey", "p_name", "p_mfgr", "p_brand", "p_type",
        "p_size", "p_container", "p_retailprice", "p_comment",
    ),
    "partsupp": (
        "ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost",
        "ps_comment",
    ),
}


#: the reference's SSB (Star Schema Benchmark) suites REDEFINE
#: customer/part/supplier with SSB columns (mcs7572_ssbValidation et
#: al.) — same table names, different schema family. A statement
#: naming one of these runs against the SSB fixture there, not the
#: TPC-H one our testdata mirrors.
SSB_COLUMNS: frozenset[str] = frozenset({
    "c_city", "c_nation", "c_region",
    "p_category", "p_brand1", "p_color",
    "s_city", "s_nation", "s_region",
    "lo_orderkey", "lo_custkey", "lo_revenue", "d_datekey", "d_year",
})


def _fixture_columns(sf_dir: str) -> dict[str, set[str]]:
    """Columns our parquet fixtures actually carry (pyarrow footer
    read — no Spark)."""
    import os

    import pyarrow.parquet as pq

    out: dict[str, set[str]] = {}
    for t in REFERENCE_COLUMNS:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = {n.lower() for n in pq.read_schema(p).names}
    return out


_MISSING_COL_RES = [
    # Spark: `tbl`.`col` / `col` cannot be resolved
    r"name\s+(?:`[\w$]+`\.)?`([\w$]+)`\s+cannot\s+be\s+resolved",
    # DuckDB binder
    r'column\s+"([\w$]+)"\s+not\s+found',
    r'Referenced column\s+"([\w$]+)"',
]


def _default_sf_dir() -> str:
    """Mirror mtr_probe's fixture preference: audit against the
    augmented probe fixture when it exists (gen_probe_fixture.py), so
    'missing fixture column' reflects what the probe actually ran."""
    import os

    aug = ".fixtures/probe_sf0.01"
    return aug if os.path.isdir(aug) else "/root/testdata/sf0.01"


def neither_fixture_audit(
    rows: list[dict], sf_dir: str | None = None
) -> None:
    """Per-statement adjudication of the neither bucket (VERDICT r8
    #4): name the missing fixture column for every unresolved-column
    statement, bucket the star-width shapes (ORDER BY position /
    UNION arity over ``t.*`` whose reference width exceeds the
    fixture's), and leave an explicit remainder list that must be
    empty or individually explained in COVERAGE.md."""
    if sf_dir is None:
        sf_dir = _default_sf_dir()
    print(f"   (fixture audited: {sf_dir})")
    ours = _fixture_columns(sf_dir)
    absent = {
        c: t
        for t, cols in REFERENCE_COLUMNS.items()
        for c in cols
        if c not in ours.get(t, set())
    }
    fixture_col = Counter()
    star_width: list[dict] = []
    ssb: list[dict] = []
    no_schema: list[dict] = []
    remainder: list[dict] = []
    all_ref = {c for cols in REFERENCE_COLUMNS.values() for c in cols}
    for r in rows:
        serr = r.get("spark_err") or ""
        err = serr + " " + (r.get("duck_err") or "")
        cols = set()
        for pat in _MISSING_COL_RES:
            cols.update(
                c.lower() for c in re.findall(pat, err, re.IGNORECASE)
            )
        scols = {
            c.lower()
            for pat in _MISSING_COL_RES
            for c in re.findall(pat, serr, re.IGNORECASE)
        }
        hit = sorted(c for c in cols if c in absent)
        if hit:
            for c in hit:
                fixture_col[f"{absent[c]}.{c}"] += 1
            continue
        if cols & SSB_COLUMNS:
            ssb.append(r)
            continue
        if scols and not (scols & all_ref) and not (scols & SSB_COLUMNS):
            # OUR analyzer reports a column outside the TPC-H and SSB
            # schemas: either another reference fixture family (the
            # unsigned_* suites redeclare customer with u_custkey /
            # u_bigcustkey columns) or a deliberate MTR error-case
            # statement (--error directives are stripped at harvest).
            # DuckDB-only binder noise (double-quoted strings read as
            # identifiers) deliberately doesn't land here.
            no_schema.append(r)
            continue
        if re.search(
            r"ORDER_BY_POS_OUT_OF_RANGE|NUM_COLUMNS_MISMATCH", err
        ) and re.search(r"(?:\w+\s*\.\s*\*|select\s+\*)", r["sql"],
                        re.IGNORECASE):
            star_width.append(r)
            continue
        remainder.append(r)
    print(
        f"\n-- fixture-absent columns (named): "
        f"{sum(fixture_col.values())} statements"
    )
    for col, n in fixture_col.most_common():
        print(f"   {n:4d}x missing fixture column {col}")
    print(
        f"-- star-width shapes (t.* / SELECT * spans reference-only "
        f"columns): {len(star_width)} statements"
    )
    for r in star_width[:5]:
        print(f"   e.g. [{r['src']}] {r['sql'][:120]}")
    print(
        f"-- SSB-schema columns: {len(ssb)} statements"
        + (" (augmented fixture carries the SSB schema — these need"
           " individual adjudication)" if "probe_" in sf_dir else
           " (reference's SSB fixture family, not TPC-H)")
    )
    for r in ssb[:3]:
        print(f"   e.g. [{r['src']}] {r['sql'][:120]}")
    print(
        f"-- column outside TPC-H/SSB schemas (other reference "
        f"fixture families, e.g. unsigned_* u_custkey, or MTR "
        f"error-case statements): {len(no_schema)} statements"
    )
    for r in no_schema[:3]:
        print(f"   e.g. [{r['src']}] {r['sql'][:120]}")
    print(f"-- REMAINDER (must be adjudicated individually): "
          f"{len(remainder)}")
    for r in remainder:
        first = (r.get("spark_err") or "?").split("\n")[0][:110]
        print(f"   [{r['src']}] {r['sql'][:130]}")
        print(f"      spark: {first}")


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mtr_buckets.json"
    buckets = json.load(open(path))
    if buckets.get("spark_only"):
        print(
            f"=== spark_only: {len(buckets['spark_only'])} statements "
            "(DuckDB cannot parse — family audit) ==="
        )
        spark_only_audit(buckets["spark_only"])
    for bucket in ("duck_only", "neither", "diff"):
        rows = buckets.get(bucket, [])
        print(f"\n=== {bucket}: {len(rows)} statements ===")
        if bucket == "neither" and rows:
            neither_fixture_audit(rows)
        groups: dict[str, list] = defaultdict(list)
        for r in rows:
            groups[classify(r.get("spark_err"))].append(r)
        for label, rs in sorted(
            groups.items(), key=lambda kv: -len(kv[1])
        ):
            print(f"\n-- {label}: {len(rs)}")
            # distinct leading error lines, most common first
            tails = Counter(
                (r.get("spark_err") or "?").split("\n")[0][:160]
                for r in rs
            )
            for t, n in tails.most_common(8):
                print(f"   {n:4d}x {t}")
            for r in rs[:3]:
                print(f"   e.g. [{r['src']}] {r['sql'][:140]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
