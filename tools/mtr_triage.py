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


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mtr_buckets.json"
    buckets = json.load(open(path))
    for bucket in ("duck_only", "neither", "diff"):
        rows = buckets.get(bucket, [])
        print(f"\n=== {bucket}: {len(rows)} statements ===")
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
