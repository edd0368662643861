"""MariaDB JSON function long tail, as pure JVM column expressions.

The reference ships 28 JSON functions (utils/funcexp/func_json_*.cpp,
jsonhelpers.cpp). Spark covers extraction/construction natively
(get_json_object, from_json/to_json, json_array_length,
json_object_keys); this module adds the MariaDB-specific tail —
json_type, json_depth, json_quote, json_search, json_merge_preserve,
json_normalize, json_compact — built from string/higher-order
expressions so they stay inside whole-stage codegen (no Python UDFs;
a 100 TB scan applies them at JVM speed).

Contract notes (documented limitations, pinned by tests):

- ``json_merge_preserve`` / ``json_normalize`` / ``json_search``
  operate on FLAT objects (scalar values only), parsed via
  ``from_json(col, 'map<string,string>')``. Nested containers would
  need a recursive parser — the reference implements these in C++
  recursion (func_json_merge.cpp); the flat contract covers the
  events.props-style payloads this engine's fixtures and pipelines
  use. A JSON ``null`` value is indistinguishable from an absent key
  after map parsing (both surface as SQL NULL).
- Scalar re-emission quotes any value that does not lex as a JSON
  number / boolean / null, so the string ``"1"`` round-trips as the
  number ``1`` (same coercion MariaDB applies when values transit
  its dynamic-string representation).
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

# Matches a complete JSON string literal; used to erase literals before
# structural analysis so quotes/brackets inside strings don't count.
_STRING_LIT = r'"([^"\\]|\\.)*"'

_SCALAR_RE = r"^(-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?|true|false|null)$"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def json_type(col: Column | str) -> Column:
    """JSON_TYPE (func_json_type.cpp): OBJECT / ARRAY / STRING /
    BOOLEAN / NULL / INTEGER / DOUBLE classification of a JSON doc."""
    t = F.trim(_c(col))
    return (
        F.when(t.isNull(), F.lit(None).cast("string"))
        .when(t.startswith("{"), F.lit("OBJECT"))
        .when(t.startswith("["), F.lit("ARRAY"))
        .when(t.startswith('"'), F.lit("STRING"))
        .when(t.isin("true", "false"), F.lit("BOOLEAN"))
        .when(t == "null", F.lit("NULL"))
        .when(t.rlike(r"^-?[0-9]+$"), F.lit("INTEGER"))
        .when(
            t.rlike(r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"),
            F.lit("DOUBLE"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def json_quote(col: Column | str) -> Column:
    """JSON_QUOTE (func_json_quote.cpp): wrap a plain string as a JSON
    string literal, escaping backslash, quote, and control chars."""
    s = _c(col)
    for raw, esc in (
        ("\\", "\\\\"),
        ('"', '\\"'),
        ("\n", "\\n"),
        ("\r", "\\r"),
        ("\t", "\\t"),
        ("\b", "\\b"),
        ("\f", "\\f"),
    ):
        s = F.replace(s, F.lit(raw), F.lit(esc))
    return F.concat(F.lit('"'), s, F.lit('"'))


def json_depth(col: Column | str) -> Column:
    """JSON_DEPTH (func_json_depth.cpp): max nesting depth — scalar or
    empty container = 1, flat object/array = 2, each nesting level +1.

    Pure-expression construction: erase string literals, collapse
    scalar runs to one token, then fold over the remaining characters
    tracking bracket depth; a container-open or scalar token at depth
    ``d`` witnesses depth ``d+1``.
    """
    s = F.regexp_replace(_c(col), _STRING_LIT, "0")
    s = F.regexp_replace(s, r"[\s:,]+", "")
    s = F.regexp_replace(s, r"[^{}\[\]]+", "s")
    chars = F.filter(F.split(s, ""), lambda ch: ch != "")
    folded = F.aggregate(
        chars,
        F.struct(F.lit(0).alias("d"), F.lit(0).alias("m")),
        lambda acc, ch: F.struct(
            (
                acc["d"]
                + F.when(ch.isin("{", "["), F.lit(1))
                .when(ch.isin("}", "]"), F.lit(-1))
                .otherwise(F.lit(0))
            ).alias("d"),
            F.greatest(
                acc["m"],
                F.when(ch.isin("{", "[", "s"), acc["d"] + 1).otherwise(
                    acc["d"]
                ),
            ).alias("m"),
        ),
        lambda acc: acc["m"],
    )
    return F.when(_c(col).isNull(), F.lit(None).cast("int")).otherwise(
        folded.cast("int")
    )


def _emit_scalar(v: Column) -> Column:
    """Re-emit a map-parsed scalar as JSON text: numbers/booleans/null
    stay raw, everything else is quoted."""
    return (
        F.when(v.isNull(), F.lit("null"))
        .when(v.rlike(_SCALAR_RE), v)
        .otherwise(json_quote(v))
    )


def _flat(col: Column | str) -> Column:
    return F.from_json(_c(col), "map<string,string>")


def _object_from_entries(
    keys: Column, value_of: Callable[[Column], Column]
) -> Column:
    entries = F.transform(
        keys,
        lambda k: F.concat(json_quote(k), F.lit(":"), value_of(k)),
    )
    return F.concat(F.lit("{"), F.array_join(entries, ","), F.lit("}"))


def json_merge_preserve(a: Column | str, b: Column | str) -> Column:
    """JSON_MERGE_PRESERVE (func_json_merge.cpp) over flat objects:
    keys present in both sides keep BOTH values as a 2-element array
    (vs json_merge_patch, where b wins)."""
    ma, mb = _flat(a), _flat(b)
    keys = F.array_union(F.map_keys(ma), F.map_keys(mb))

    def value_of(k: Column) -> Column:
        va, vb = F.element_at(ma, k), F.element_at(mb, k)
        return F.when(
            va.isNotNull() & vb.isNotNull(),
            F.concat(
                F.lit("["),
                _emit_scalar(va),
                F.lit(","),
                _emit_scalar(vb),
                F.lit("]"),
            ),
        ).otherwise(_emit_scalar(F.coalesce(va, vb)))

    return _object_from_entries(keys, value_of)


def json_normalize(col: Column | str) -> Column:
    """JSON_NORMALIZE (func_json_normalize.cpp) over flat objects:
    keys sorted lexicographically, minimal whitespace."""
    m = _flat(col)
    keys = F.array_sort(F.map_keys(m))
    return _object_from_entries(
        keys, lambda k: _emit_scalar(F.element_at(m, k))
    )


def json_search(col: Column | str, search: Column | str) -> Column:
    """JSON_SEARCH(doc, 'one', str) (func_json_search.cpp) over flat
    objects: the path of the first key (document order) whose value
    equals ``search``, as a JSON string — or NULL.

    Path member rendering follows MariaDB's json path printer: a key
    that lexes as an identifier prints bare (``"$.a"``); anything else
    prints as a quoted member with its quotes/backslashes escaped, and
    the whole path is then itself a JSON string — a key ``my key``
    yields ``"$.\\"my key\\""``, never an unbalanced splice."""
    m = _flat(col)
    needle = search if isinstance(search, Column) else F.lit(search)
    hits = F.filter(
        F.map_keys(m), lambda k: F.element_at(m, k) == needle
    )
    key = F.element_at(hits, 1)
    # member text inside the path: bare identifier, or a quoted member
    # ("key" with inner \ and " escaped) — json_quote gives the correctly
    # escaped quoted form; the outer JSON-string layer then escapes the
    # member's own quotes once more.
    quoted_member = json_quote(key)  # e.g. "my key" (with real quotes)
    member = F.when(
        key.rlike(r"^[A-Za-z_][A-Za-z0-9_]*$"), key
    ).otherwise(json_quote_escape_layer(quoted_member))
    return F.when(
        F.size(hits) > 0,
        F.concat(F.lit('"$.'), member, F.lit('"')),
    ).otherwise(F.lit(None).cast("string"))


def json_quote_escape_layer(s: Column) -> Column:
    """Escape a path fragment for embedding inside a JSON string literal
    (backslashes then quotes — the second escaping layer of a quoted
    path member)."""
    s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
    return F.replace(s, F.lit('"'), F.lit('\\"'))


def json_compact(col: Column | str) -> Column:
    """JSON_COMPACT (func_json_format.cpp JSON_FORMAT compact mode):
    strip all whitespace outside string literals. The regex matches
    either a whole string literal (kept via $1) or a whitespace run
    (dropped), so spaces inside strings survive."""
    return F.regexp_replace(
        _c(col), f"({_STRING_LIT})|\\s+", "$1"
    )


# A position is OUTSIDE every string literal iff the remainder of the
# document parses as (non-quote chars | complete string literals)* —
# valid for well-formed JSON, where quotes always pair up.
_OUTSIDE_STRINGS = '(?=(?:[^"]|"(?:[^"\\\\]|\\\\.)*")*$)'


def json_loose(col: Column | str) -> Column:
    """JSON_LOOSE (func_json_format.cpp JSON_FORMAT loose mode — the
    one funcexp spelling previously missing here): normalize to compact
    then add one space after every ':' and ',' that sits outside string
    literals, MariaDB's documented readable single-line form."""
    s = json_compact(col)
    s = F.regexp_replace(s, "," + _OUTSIDE_STRINGS, ", ")
    return F.regexp_replace(s, ":" + _OUTSIDE_STRINGS, ": ")


def json_path_ext(col: Column | str, path: str) -> Column:
    """MariaDB 10.9 JSON path EXTENSIONS on a LITERAL path: negative
    array indices ``$.a[-2]``, ``[last]`` / ``[last-N]``, and range
    slices ``[A to B]`` (func_json_* via the server's json_path
    extensions; mysql-test/columnstore/basic/t/json_range_expression
    .test). Spark's get_json_object speaks none of these, so the literal
    path is COMPILED HERE into a chain of JVM ops — get_json_object for
    plain steps, json_array_length arithmetic for last/negative indices
    (rendered as a dynamic path), and a from_json→slice→to_json for
    ranges. Everything stays whole-stage-codegen; no Python at runtime.

    Returns the JSON text at the path (NULL if absent), like
    JSON_QUERY/JSON_EXTRACT on one match.
    """
    import re

    cur = _c(col)
    steps = re.findall(r"\.([A-Za-z_]\w*)|\[([^\]]+)\]", path.strip("$ "))
    for key, idx in steps:
        if key:
            cur = F.get_json_object(cur, f"$.{key}")
            continue
        tok = idx.strip().lower().replace(" ", "")
        rng = re.fullmatch(r"(last(-\d+)?|-?\d+)to(last(-\d+)?|-?\d+)", tok)
        n = F.json_array_length(cur)

        def resolve(t: str) -> Column:
            # absolute 0-based index as a Column (may depend on length)
            if t.startswith("last"):
                off = int(t[4:] or "0")  # "last-2" -> -2
                return n - 1 + F.lit(off)
            i = int(t)
            return n + F.lit(i) if i < 0 else F.lit(i)

        if rng:
            lo = resolve(rng.group(1))
            hi = resolve(rng.group(3))
            # slice(arr, start, length) is 1-based; clamp to the array
            arr = F.from_json(cur, "array<string>")
            lo1 = F.greatest(lo + 1, F.lit(1))
            length = F.greatest(hi - lo + 1, F.lit(0))
            picked = F.slice(arr, lo1, length)
            # elements came out as strings; containers re-emit verbatim,
            # scalars through the number/bool/null-aware quoter
            cur = F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(
                        picked,
                        lambda e: F.when(
                            e.rlike(r"^\s*[\[{]"), e
                        ).otherwise(_emit_scalar(e)),
                    ),
                    ", ",
                ),
                F.lit("]"),
            )
        else:
            pos = resolve(tok)
            # dynamic path (depends on the row's array length): the
            # PySpark wrapper insists on a str path, but the underlying
            # SQL function accepts any expression — call it directly
            cur = F.when(
                (pos >= 0) & (pos < n),
                F.call_function(
                    "get_json_object",
                    cur,
                    F.concat(
                        F.lit("$["), pos.cast("string"), F.lit("]")
                    ),
                ),
            )
    return cur
