"""Mini-MTR cross-check: mine the reference's MTR suites for SELECT
statements over tables our fixture catalog also has (the reference's
dbt3/tpch schemas share names with /root/testdata), run each through
the Engine's MariaDB front end AND through DuckDB, and compare
unordered results.

This is a mechanical semantic-gap finder, not a golden-output runner:
statements that only one side can parse are counted but not failed
(MariaDB-only spellings DuckDB lacks are exactly what the oracle'd
registry rows cover); a FAIL means BOTH engines accepted the statement
and returned different answers — a real divergence worth a look.

Usage: python tools/mtr_probe.py [suite_dir ...] [--limit N]
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNOWN_TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem",
}

#: with the augmented fixture (tools/gen_probe_fixture.py) the
#: partsupp table and the SSB star schema exist too, so statements
#: over them become harvestable
AUGMENTED_TABLES = KNOWN_TABLES | {"partsupp", "lineorder", "dateinfo"}

DEFAULT_SUITES = [
    "/root/reference/mysql-test/columnstore/devregression/t",
    "/root/reference/mysql-test/columnstore/basic/t",
    "/root/reference/mysql-test/columnstore/extended/t",
    "/root/reference/mysql-test/columnstore/bugfixes",
    "/root/reference/mysql-test/columnstore/autopilot/t",
]


#: transient in-test DDL the probe REPLAYS as view overlays
#: (mcs7167_regression_bug5133: ALTER TABLE nation ADD COLUMN c1
#: varchar(20) default 'abcd'; SELECT ...; DROP COLUMN c1 — the
#: SELECT is only meaningful with the column present)
_DDL_ADD_RE = re.compile(
    r"^alter\s+table\s+`?(\w+)`?\s+add\s+(?:column\s+)?`?(\w+)`?\s+"
    r"([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
    r"(?:.*?\bdefault\s+('[^']*'|[-\w.]+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DDL_DROP_RE = re.compile(
    r"^alter\s+table\s+`?(\w+)`?\s+drop\s+(?:column\s+)?`?(\w+)`?\s*$",
    re.IGNORECASE,
)


def _overlay_type(t: str) -> str | None:
    """MariaDB column type → a cast target BOTH Spark and DuckDB
    accept (None = unsupported, the ALTER is skipped and dependent
    SELECTs stay in their error buckets)."""
    tl = t.lower().replace(" ", "")
    if tl.startswith(("varchar", "char", "text")):
        lm = re.search(r"\((\d+)\)", tl)
        # Spark needs a length on VARCHAR; STRING is a DuckDB alias
        return f"VARCHAR({lm.group(1)})" if lm else "STRING"
    if tl.startswith("decimal"):
        return t.upper().replace(" ", "")
    if tl.startswith(("double", "float", "real")):
        return "DOUBLE"
    if tl.startswith(("datetime", "timestamp")):
        return "TIMESTAMP"
    if tl.startswith("date"):
        return "DATE"
    if tl.startswith(("tinyint", "smallint", "mediumint", "bigint",
                      "int")):
        return "BIGINT"
    return None


def harvest(
    suite_dirs: list[str], tables: set[str] = KNOWN_TABLES
) -> list[tuple[str, str, tuple]]:
    """(source, statement, overlays) triples: top-level SELECTs whose
    referenced tables are all in the fixture catalog. ``overlays``
    replays any transient in-test ADD COLUMN DDL active at that point
    of the file as (table, column, cast_expr) items — empty for the
    overwhelmingly common case."""
    out = []
    for d in suite_dirs:
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".test"):
                continue
            text = open(os.path.join(d, fn), errors="replace").read()
            # drop MTR directives and comments, then strip INLINE
            # `# ...` trailers (MariaDB end-of-line comments: the SSB
            # q*mod suites write `from a, b  # changed order` mid-
            # statement) — quote-aware so '#' inside literals survives
            def strip_inline_hash(ln: str) -> str:
                in_str = None
                for ci, ch in enumerate(ln):
                    if in_str:
                        if ch == in_str:
                            in_str = None
                    elif ch in ("'", '"', "`"):
                        in_str = ch
                    elif ch == "#":
                        return ln[:ci]
                return ln

            lines = [
                strip_inline_hash(ln)
                for ln in text.splitlines()
                if not ln.strip().startswith(("#", "--"))
            ]
            body = "\n".join(lines)
            active: dict[str, dict[str, str]] = {}  # table → col → expr
            for stmt in body.split(";"):
                s = stmt.strip()
                am = _DDL_ADD_RE.match(s)
                if am and am.group(1).lower() in tables:
                    typ = _overlay_type(am.group(3))
                    if typ:
                        dflt = am.group(4) or "NULL"
                        active.setdefault(am.group(1).lower(), {})[
                            am.group(2).lower()
                        ] = f"CAST({dflt} AS {typ})"
                    continue
                dm = _DDL_DROP_RE.match(s)
                if dm:
                    active.get(dm.group(1).lower(), {}).pop(
                        dm.group(2).lower(), None)
                    continue
                if not re.match(r"select\b", s, re.IGNORECASE):
                    continue
                refs = set()
                for mm in re.finditer(
                    r"\b(?:from|join)\s+([^()]+?)(?=\bwhere\b|\bjoin\b"
                    r"|\bon\b|\bgroup\b|\border\b|\bhaving\b|\blimit\b"
                    r"|\bunion\b|\bleft\b|\bright\b|\binner\b"
                    r"|\bcross\b|$)",
                    s,
                    re.IGNORECASE,
                ):
                    # comma-joined FROM lists: every member counts —
                    # a single-name regex let statements over absent
                    # tables (lineorder, dateinfo) slip through as
                    # guaranteed both-engine failures
                    for part in mm.group(1).split(","):
                        w = re.match(r"\s*`?(\w+)`?", part)
                        if w:
                            refs.add(w.group(1).lower())
                refs -= {"dual"}
                if not refs or not refs <= tables:
                    continue
                if re.search(
                    r"@|\bdtypes\b|\bCALFLUSH|idb[A-Z]|\bRAND\s*\("
                    r"|\bINTO\s+(OUT|DUMP)FILE\b",  # side-effectful
                    s,
                    re.IGNORECASE,
                ):
                    continue
                ov = tuple(
                    (t, c, e)
                    for t in sorted(active)
                    if t in refs and active[t]
                    for c, e in sorted(active[t].items())
                )
                out.append((fn, re.sub(r"\s+", " ", s), ov))
    # dedupe, keep first source (overlay state is part of the key: the
    # same SELECT text means different things under different DDL)
    seen, uniq = set(), []
    for src, s, ov in out:
        k = (s.lower(), ov)
        if k not in seen:
            seen.add(k)
            uniq.append((src, s, ov))
    return uniq


def apply_overlays(spark, con, sf_dir: str, ov: tuple):
    """Replay transient ADD COLUMN DDL as view overlays on BOTH
    engines; returns the saved Spark DataFrames for restore_overlays."""
    from mariadb_columnstore_engine_spark.oracle import table_glob

    bytab: dict[str, list[tuple[str, str]]] = {}
    for t, c, e in ov:
        bytab.setdefault(t, []).append((c, e))
    saved = {}
    for t, cols in bytab.items():
        saved[t] = spark.table(t)
        saved[t].selectExpr(
            "*", *[f"{e} AS {c}" for c, e in cols]
        ).createOrReplaceTempView(t)
        sel = ", ".join(f"{e} AS {c}" for c, e in cols)
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT *, {sel} "
            f"FROM '{table_glob(sf_dir, t)}'"
        )
    return saved


def restore_overlays(spark, con, sf_dir: str, saved: dict) -> None:
    from mariadb_columnstore_engine_spark.oracle import table_glob

    for t, df in saved.items():
        df.createOrReplaceTempView(t)
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * "
            f"FROM '{table_glob(sf_dir, t)}'"
        )


def canon(rows) -> list[tuple]:
    def c(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, bool):
            return ("b", int(v))
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            if v and abs(v) >= 1e8:
                # 4-decimal ABSOLUTE rounding on an e8+ value demands
                # more significant digits than IEEE double carries
                # (e12 moments: two correct engines agree to ~3e-15
                # RELATIVE — a few ulps — yet differ by ~1e-3 absolute,
                # mcs6203 REGR_SXX). Cap the canon at 12 significant
                # digits for large magnitudes: strict far beyond any
                # semantic difference, blind to accumulation-order ulps.
                return ("f", round(v, 11 - int(math.floor(
                    math.log10(abs(v))))))
            return ("f", round(v, 4))
        if isinstance(v, int):
            return ("f", round(float(v), 4))
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return ("f", round(float(v), 4))
        except Exception:  # noqa: BLE001
            pass
        if hasattr(v, "isoformat"):
            return ("s", v.isoformat()[:19].replace("T", " "))
        if isinstance(v, bytes):
            return ("s", v.decode(errors="replace"))
        return ("s", str(v))

    return sorted(tuple(c(v) for v in r) for r in rows)


def rows_match(srows, drows) -> bool:
    """Exact canon equality, with a float-tolerance fallback.

    ANY grid rounding (canon's 4-decimal / significant-digit caps)
    flips when two correct engines' values straddle a grid line —
    at 15k rows/statement even a 1e-4 straddle probability yields ~1
    flip per statement (the r10 TRUNCATE-battery experiment: REGR
    moments agree to ~12.5 significant digits, grids at ANY width
    still flip). The fallback re-pairs rows sorted by canon and
    accepts numeric cells agreeing to 9 significant digits (rel 1e-9,
    abs floor 1e-4) — two orders of magnitude stricter than any
    semantic difference, blind to accumulation-order noise."""
    ca, cb = canon(srows), canon(drows)
    if ca == cb:
        return True
    if len(srows) != len(drows):
        return False
    import decimal

    num = (int, float, decimal.Decimal)
    # pair rows by sorting each side on its own canon tuple (leading
    # key columns anchor the order; a mis-pairing just records a DIFF,
    # exactly the pre-fallback behavior)
    sa = sorted(srows, key=lambda r: tuple(map(str, canon([r])[0])))
    sb = sorted(drows, key=lambda r: tuple(map(str, canon([r])[0])))
    for ra, rb in zip(sa, sb):
        if len(ra) != len(rb):
            return False
        for a, b in zip(ra, rb):
            if a is None or b is None:
                if a is not b:
                    return False
                continue
            if isinstance(a, num) and isinstance(b, num) and not (
                isinstance(a, bool) or isinstance(b, bool)
            ):
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if abs(fa - fb) > max(
                    1e-4, 1e-9 * max(abs(fa), abs(fb))
                ):
                    return False
                continue
            if canon([(a,)]) != canon([(b,)]):
                return False
    return True


def _collect_with_timeout(spark, eng, s: str, seconds: int = 20):
    """Run one probe statement with a hard wall-clock cap: harvested
    MTR text includes deliberate cartesian shapes (lineitem x
    lineitem) that are fine at the reference's tiny MTR fixtures but
    explode at ours — cancel the job group and treat as spark-skip."""
    import threading

    group = f"mtr-probe-{abs(hash(s)) % 10**9}"
    result: list = [None]
    err: list = [None]

    def run():
        try:
            spark.sparkContext.setJobGroup(group, s[:80], True)
            # the full statement router (not just the query path) so
            # router-handled SELECT forms (INTO OUTFILE, SHOW-likes)
            # count as parsed
            r = eng.execute(s)
            if hasattr(r, "limit"):  # DataFrame
                result[0] = [
                    tuple(x) for x in r.limit(100000).collect()
                ]
            elif isinstance(r, list):
                result[0] = [tuple(x) for x in r]
            else:  # row counts / scalar protocol results
                result[0] = [(r,)]
        except Exception as e:  # noqa: BLE001 — reported via err
            err[0] = e
        finally:
            # Spark 4 removed SparkContext.clearJobGroup; resetting to
            # an empty group detaches this thread from the probe group
            try:
                spark.sparkContext.setJobGroup("", "")
            except Exception:  # noqa: BLE001 — best-effort detach
                pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(10)
        raise TimeoutError(f"probe statement exceeded {seconds}s")
    if err[0] is not None:
        raise err[0]
    return result[0]


#: MariaDB TRUNCATE(X, D) in DuckDB spelling — the IDENTICAL decimal
#: remainder-strip arithmetic the engine emits (sqltrans fn template),
#: so both engines truncate the same doubles the same way. This is
#: what turns the ~2.2k TRUNCATE-wrapped window-battery statements
#: from value-UNCHECKED spark-only rows into value-checked both-parsed
#: rows (r10; DuckDB has no TRUNCATE(x, d) function of its own).
_TRUNC_FORM = (
    "cast((CASE WHEN ({1}) >= 0 THEN"
    " cast({0} as decimal(38,15))"
    "  - (cast({0} as decimal(38,15))"
    "     % cast(power(10, -least(({1}), 15)) as decimal(38,15)))"
    " ELSE"
    " cast((CASE WHEN ({0}) >= 0"
    "  THEN floor(cast({0} as decimal(38,15))"
    "    / cast(power(10, -({1})) as decimal(20,0)))"
    "  ELSE ceil(cast({0} as decimal(38,15))"
    "    / cast(power(10, -({1})) as decimal(20,0))) END)"
    "  as decimal(38,15))"
    "  * cast(power(10, -({1})) as decimal(20,0))"
    " END) as double)"
)


def _find_balanced_plain(s: str, open_at: int) -> int:
    """Index just past the ')' matching s[open_at] == '(' (quote-aware)."""
    depth, i, in_str, n = 0, open_at, None, len(s)
    while i < n:
        c = s[i]
        if in_str:
            if c == in_str:
                in_str = None
        elif c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return n


def _split_args_plain(s: str) -> list[str]:
    out, depth, last, in_str = [], 0, 0, None
    for i, c in enumerate(s):
        if in_str:
            if c == in_str:
                in_str = None
        elif c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[last:i])
            last = i + 1
    out.append(s[last:])
    return out


def _rewrite_truncate(stmt: str) -> str:
    pat = re.compile(r"\bTRUNCATE\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(stmt)
        if not m:
            return stmt
        open_at = stmt.index("(", m.start())
        end = _find_balanced_plain(stmt, open_at)
        args = _split_args_plain(stmt[open_at + 1 : end - 1])
        if len(args) != 2:
            return stmt  # not the 2-arg numeric form; leave as-is
        inner = _rewrite_truncate(args[0].strip())  # nested TRUNCATEs
        repl = _TRUNC_FORM.format(inner, args[1].strip())
        stmt = stmt[: m.start()] + repl + stmt[end:]


def duck_dialect(stmt: str) -> str:
    """MariaDB semantics the ORACLE side must mirror: bare
    STDDEV()/STD()/VARIANCE() are the POPULATION variants in
    MariaDB (wf_stats.cpp divides by n) while DuckDB's, like
    Spark's, are the sample forms — spell them *_POP so both
    engines compute what the reference computes. (*_SAMP/*_POP
    spellings pass through untouched.) TRUNCATE(x, d) renders as
    the engine's own decimal remainder-strip arithmetic (DuckDB
    has no such function)."""
    stmt = _rewrite_truncate(stmt)
    stmt = re.sub(
        r"\b(?:STDDEV|STD)\s*\(", "STDDEV_POP(", stmt,
        flags=re.IGNORECASE,
    )
    return re.sub(
        r"\bVARIANCE\s*\(", "VAR_POP(", stmt, flags=re.IGNORECASE
    )


def main() -> int:
    argv = sys.argv[1:]
    args, limit, dump, raw = [], None, None, False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--limit":  # space form: --limit N
            limit = int(argv[i + 1])
            i += 2
        elif a.startswith("--limit="):
            limit = int(a.split("=", 1)[1])
            i += 1
        elif a == "--dump":  # bucket details (JSON) for triage
            dump = argv[i + 1]
            i += 2
        elif a.startswith("--dump="):
            dump = a.split("=", 1)[1]
            i += 1
        elif a == "--raw":  # force the un-augmented driver fixture
            raw = True
            i += 1
        elif a.startswith("--"):
            i += 1
        else:
            args.append(a)
            i += 1
    suites = args or DEFAULT_SUITES

    # Fixture selection: prefer the augmented probe fixture (same
    # driver data + the standard TPC-H columns/partsupp the driver
    # subset omits — tools/gen_probe_fixture.py) so fixture-gap
    # statements become value-checked; --raw forces the driver dir.
    # An explicitly-set SPARK_GRAFT_SF_DIR wins over the auto-prefer
    # (ADVICE r9: pointing the probe at sf1 must actually run sf1),
    # and the augmented path resolves relative to the repo root so a
    # different cwd doesn't silently fall back to raw.
    augmented = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures/probe_sf0.01",
    )
    env_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not raw and env_dir is None and os.path.isdir(augmented):
        sf_dir = augmented
        tables = AUGMENTED_TABLES
    else:
        sf_dir = env_dir or "/root/testdata/sf0.01"
        tables = KNOWN_TABLES
    print(f"fixture: {sf_dir}")

    stmts = harvest(suites, tables)
    if limit:
        stmts = stmts[:limit]
    print(f"harvested {len(stmts)} SELECTs over fixture tables")

    import duckdb

    from mariadb_columnstore_engine_spark.engine import Engine
    from mariadb_columnstore_engine_spark.oracle import duckdb_connect
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session("mtr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, sf_dir)
    con = duckdb_connect(sf_dir)

    n_both = n_match = n_spark_only = n_duck_only = n_neither = 0
    fails = []
    buckets = {
        "duck_only": [], "neither": [], "diff": [], "spark_only": [],
    }
    for idx, (src, s, ov) in enumerate(stmts):
        if idx and idx % 500 == 0:
            print(f"progress {idx}/{len(stmts)}", flush=True)
        derr = serr = None
        saved = apply_overlays(spark, con, sf_dir, ov) if ov else {}
        try:
            drows = con.execute(duck_dialect(s)).fetchall()
        except Exception as e:  # noqa: BLE001 — bucketed
            drows, derr = None, f"{type(e).__name__}: {e}"
        try:
            srows = _collect_with_timeout(spark, eng, s)
        except Exception as e:  # noqa: BLE001 — bucketed
            srows, serr = None, f"{type(e).__name__}: {e}"
        if saved:
            restore_overlays(spark, con, sf_dir, saved)
        if srows is None and drows is None:
            n_neither += 1
            buckets["neither"].append(
                {"src": src, "sql": s, "spark_err": serr[:400],
                 "duck_err": derr[:400]}
            )
            continue
        if srows is None:
            n_duck_only += 1
            buckets["duck_only"].append(
                {"src": src, "sql": s, "spark_err": serr[:400]}
            )
            continue
        if drows is None:
            n_spark_only += 1
            # the bucket the oracle CANNOT check (DuckDB can't parse
            # the spelling) — dumped so tools/mtr_triage.py can audit
            # that every spelling family has an oracle'd registry row
            buckets["spark_only"].append(
                {"src": src, "sql": s, "duck_err": derr[:400],
                 "spark_rows": len(srows)}
            )
            continue
        n_both += 1
        if rows_match(srows, drows):
            n_match += 1
        else:
            fails.append((src, s, len(srows), len(drows)))
            buckets["diff"].append(
                {"src": src, "sql": s, "spark_rows": len(srows),
                 "duck_rows": len(drows)}
            )
    print(
        f"both-parsed {n_both}: {n_match} match, {len(fails)} DIFFER; "
        f"spark-only {n_spark_only}, duck-only {n_duck_only}, "
        f"neither {n_neither}"
    )
    for src, s, a, b in fails:
        print(f"DIFF [{src}] spark_rows={a} duck_rows={b}: {s[:160]}")
    if dump:
        import json

        with open(dump, "w") as f:
            json.dump(buckets, f, indent=1)
        print(f"bucket detail written to {dump}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
