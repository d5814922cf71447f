"""go-sqlite3-stdlib function parity (SURVEY.md §2.8 layer 2).

The reference exposes a fixed extended function library (registered as the
`sqlite3_extended` driver, reference sqlite.go:28, README.md:417-425 and
695-698). Here every function is either:

  * a Spark built-in already (strings/math/hash — nothing to do),
  * a SQL scalar UDF (`CREATE TEMPORARY FUNCTION ... RETURN <expr>`,
    Spark 4 SQL UDFs) that expands to built-ins — JVM-side, codegen'd,
    usable from both spark.sql and the CLI; registered by
    :func:`register_all`,
  * or an aggregate alias (`percentile_75(x)` → `percentile(x, 0.75)`)
    that SQL UDFs cannot express — those are rewritten by name in
    dsq_spark.rewrite (AGG_ALIASES below).

Best-effort date parsing: the reference parses arbitrary timestamp strings
at query time via araddon/dateparse (README.md:695-698). `best_effort_ts`
mirrors the common formats with a coalesce of try_to_timestamp calls —
pure JVM, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Formats best_effort_ts tries, in order (first match wins). Mirrors the
# high-frequency cases of the reference's dateparse dependency.
_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
    "dd MMM yyyy HH:mm:ss",
    "dd MMM yyyy",
    # (RFC-822 "EEE, dd MMM yyyy HH:mm:ss zzz" is omitted: day-of-week and
    # zone-name fields raise in Spark's post-3.0 parser rather than
    # returning NULL, which would break try_to_timestamp's contract.)
]

_BEST_EFFORT = "coalesce(" + ", ".join(
    "try_to_timestamp(s, '{}')".format(f.replace("'", "\\'")) for f in _TS_FORMATS
) + ", try_to_timestamp(s))"


def _g_esc(x: str) -> str:
    """Regex-literal escape of a single char: \\x{HEX codepoint}. Inlined
    textually (not a SQL UDF) because SQL UDFs cannot be applied to lambda
    variables inside higher-order functions."""
    return "concat('\\\\x{', hex(ascii(" + x + ")), '}')"


def _glob_acc(r, st, neg, body, prior, dash) -> str:
    """named_struct literal for the glob-compiler accumulator (see below)."""
    return (
        "named_struct('r', " + r + ", 'st', " + str(st) + ", 'neg', " + neg
        + ", 'body', " + body + ", 'prior', " + prior + ", 'dash', " + dash + ")"
    )


# Class body with the held member (a.prior) flushed onto it.
_G_FLUSH = "concat(a.body, CASE WHEN a.prior <> '' THEN GLOBESC_PRIOR ELSE '' END)"

# One step of the glob→regex compiler. Accumulator fields:
#   r     regex emitted so far
#   st    0 = normal, 1 = just after '[', 2 = just after '[^', 3 = in class
#   neg   class is negated
#   body  class body emitted so far (members escaped as \x{HEX})
#   prior last class member seen but not yet emitted (it may become the
#         low end of a range, in which case it must not also be a member)
#   dash  a '-' was seen after `prior` (range pending, SQLite src/func.c:
#         '-' is a range only when a member precedes and ']'/end doesn't
#         immediately follow)
# Closing an effectively-empty class (e.g. only an inverted range [x-a])
# emits '(?!)' (never matches — SQLite: seen=0) or, negated, '.' (matches
# any one char — SQLite: seen^invert=1). An unclosed '[' at end of pattern
# makes the whole pattern unmatchable (finish lambda).
_GLOB_STEP = (
    "CASE "
    "WHEN a.st = 0 AND c = '*' THEN "
    + _glob_acc("concat(a.r, '.*')", 0, "false", "''", "''", "false")
    + " WHEN a.st = 0 AND c = '?' THEN "
    + _glob_acc("concat(a.r, '.')", 0, "false", "''", "''", "false")
    + " WHEN a.st = 0 AND c = '[' THEN "
    + _glob_acc("a.r", 1, "false", "''", "''", "false")
    + " WHEN a.st = 0 THEN "
    + _glob_acc("concat(a.r, GLOBESC_C)", 0, "false", "''", "''", "false")
    + " WHEN a.st = 1 AND c = '^' THEN "
    + _glob_acc("a.r", 2, "true", "''", "''", "false")
    + " WHEN a.st = 1 THEN "      # ']' here is a literal member (held)
    + _glob_acc("a.r", 3, "a.neg", "''", "c", "false")
    + " WHEN a.st = 2 THEN "      # ditto after '[^'
    + _glob_acc("a.r", 3, "true", "''", "c", "false")
    + " WHEN NOT a.dash AND c = ']' THEN "
    + _glob_acc(
        "concat(a.r, CASE WHEN " + _G_FLUSH + " = '' THEN "
        "CASE WHEN a.neg THEN '.' ELSE '(?!)' END "
        "ELSE concat('[', CASE WHEN a.neg THEN '^' ELSE '' END, "
        + _G_FLUSH + ", ']') END)",
        0, "false", "''", "''", "false")
    + " WHEN NOT a.dash AND c = '-' AND a.prior <> '' THEN "
    + _glob_acc("a.r", 3, "a.neg", "a.body", "a.prior", "true")
    + " WHEN NOT a.dash AND c = '-' THEN "  # '-' with no prior member: literal
    + _glob_acc("a.r", 3, "a.neg", "a.body", "'-'", "false")
    + " WHEN NOT a.dash THEN "
    + _glob_acc("a.r", 3, "a.neg", _G_FLUSH, "c", "false")
    + " WHEN c = ']' THEN "       # pending dash then ']': both literal
    + _glob_acc(
        "concat(a.r, '[', CASE WHEN a.neg THEN '^' ELSE '' END, a.body, "
        "GLOBESC_PRIOR, '\\\\x{2d}', ']')",
        0, "false", "''", "''", "false")
    + " WHEN ascii(a.prior) <= ascii(c) THEN "  # range prior..c
    + _glob_acc("a.r", 3, "a.neg",
                "concat(a.body, GLOBESC_PRIOR, '-', GLOBESC_C)",
                "''", "false")
    + " ELSE "                    # inverted range: matches nothing, emit none
    + _glob_acc("a.r", 3, "a.neg", "a.body", "''", "false")
    + " END"
)

_GLOB_REGEX_UDF = (
    "CREATE OR REPLACE TEMPORARY FUNCTION glob_regex(p STRING) RETURNS STRING "
    "RETURN aggregate(filter(split(p, ''), ch -> ch <> ''), "
    + _glob_acc("''", 0, "false", "''", "''", "false")
    + ", (a, c) -> " + _GLOB_STEP
    + ", a -> CASE WHEN a.st <> 0 THEN '(?!)' ELSE concat('(?s)^', a.r, '$') END)"
).replace("GLOBESC_PRIOR", _g_esc("a.prior")).replace("GLOBESC_C", _g_esc("c"))


def _sql_udfs() -> list[str]:
    date_parts = {
        "date_year": "year", "date_month": "month", "date_day": "day",
        "date_yearday": "dayofyear", "date_hour": "hour",
        "date_minute": "minute", "date_second": "second",
    }
    stmts = [
        # URL family → parse_url (covers all six reference url_* functions)
        "CREATE OR REPLACE TEMPORARY FUNCTION url_scheme(u STRING) RETURNS STRING RETURN lower(parse_url(u, 'PROTOCOL'))",
        "CREATE OR REPLACE TEMPORARY FUNCTION url_host(u STRING) RETURNS STRING RETURN parse_url(u, 'HOST')",
        "CREATE OR REPLACE TEMPORARY FUNCTION url_port(u STRING) RETURNS INT RETURN CAST(regexp_extract(parse_url(u, 'AUTHORITY'), ':(\\\\d+)$', 1) AS INT)",
        "CREATE OR REPLACE TEMPORARY FUNCTION url_path(u STRING) RETURNS STRING RETURN parse_url(u, 'PATH')",
        "CREATE OR REPLACE TEMPORARY FUNCTION url_param(u STRING, k STRING) RETURNS STRING RETURN parse_url(u, 'QUERY', k)",
        "CREATE OR REPLACE TEMPORARY FUNCTION url_fragment(u STRING) RETURNS STRING RETURN parse_url(u, 'REF')",
        # string aliases the stdlib spells differently
        "CREATE OR REPLACE TEMPORARY FUNCTION replicate(s STRING, n INT) RETURNS STRING RETURN repeat(s, n)",
        "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) RETURNS INT RETURN instr(s, sub)",
        "CREATE OR REPLACE TEMPORARY FUNCTION charindex(sub STRING, s STRING) RETURNS INT RETURN instr(s, sub)",
        "CREATE OR REPLACE TEMPORARY FUNCTION proper(s STRING) RETURNS STRING RETURN initcap(s)",
        # hash spellings
        "CREATE OR REPLACE TEMPORARY FUNCTION sha256(s STRING) RETURNS STRING RETURN sha2(s, 256)",
        "CREATE OR REPLACE TEMPORARY FUNCTION sha512(s STRING) RETURNS STRING RETURN sha2(s, 512)",
        # best-effort timestamp parse + date_* extraction family
        f"CREATE OR REPLACE TEMPORARY FUNCTION best_effort_ts(s STRING) RETURNS TIMESTAMP RETURN {_BEST_EFFORT}",
        "CREATE OR REPLACE TEMPORARY FUNCTION date_unix(s STRING) RETURNS BIGINT RETURN unix_timestamp(best_effort_ts(s))",
        "CREATE OR REPLACE TEMPORARY FUNCTION date_rfc3339(s STRING) RETURNS STRING RETURN date_format(best_effort_ts(s), \"yyyy-MM-dd'T'HH:mm:ssXXX\")",
        # SQLite layer-1 date/time built-ins (README.md:698). `date()` and
        # `time()` are Spark built-ins with equivalent output for parseable
        # strings and cannot be shadowed by SQL UDFs — documented delta.
        "CREATE OR REPLACE TEMPORARY FUNCTION datetime(s STRING) RETURNS STRING RETURN date_format(best_effort_ts(s), 'yyyy-MM-dd HH:mm:ss')",
        "CREATE OR REPLACE TEMPORARY FUNCTION julianday(s STRING) RETURNS DOUBLE RETURN unix_timestamp(best_effort_ts(s)) / 86400.0d + 2440587.5d",
        "CREATE OR REPLACE TEMPORARY FUNCTION unixepoch(s STRING) RETURNS BIGINT RETURN unix_timestamp(best_effort_ts(s))",
        # strftime: translate the common C codes to Java pattern letters;
        # '%s' (whole format = epoch seconds, the common idiom) is handled
        # as a special case since no Java pattern letter can express it.
        # Unconverted %-codes and alphabetic literals in the format are a
        # documented approximation (SQLite embeds a full C strftime).
        "CREATE OR REPLACE TEMPORARY FUNCTION strftime(f STRING, s STRING) RETURNS STRING RETURN "
        "CASE WHEN f = '%s' THEN CAST(unix_timestamp(best_effort_ts(s)) AS STRING) ELSE "
        "date_format(best_effort_ts(s), replace(replace(replace(replace(replace(replace(replace(f, "
        "'%Y', 'yyyy'), '%m', 'MM'), '%d', 'dd'), '%H', 'HH'), '%M', 'mm'), '%S', 'ss'), '%j', 'DDD')) END",
        # glob: SQLite full-string match with * ? wildcards and [seq]
        # classes (reference README.md:698; SQLite src/func.c globCompare
        # semantics). glob_regex compiles a glob to an anchored Java regex
        # with a char-by-char state machine (aggregate HOF — pure JVM,
        # constant-folded for literal patterns), covering the edge cases a
        # replace-chain cannot: unclosed `[` → never-match (not a regex
        # syntax error), `]` literal when first in a class, `[^...]`
        # negation, `-` ranges incl. inverted (`[x-a]` matches nothing) and
        # literal-dash positions, and metachars inside classes (every
        # literal is emitted as \\x{HEX}). `x GLOB 'pat'` is rewritten to
        # `x RLIKE glob_regex('pat')` by dsq_spark.rewrite, and glob(pat, s)
        # mirrors SQLite's function form (pattern first, returns 0/1).
        _GLOB_REGEX_UDF,
        "CREATE OR REPLACE TEMPORARY FUNCTION glob(p STRING, s STRING) RETURNS INT RETURN CAST(s RLIKE glob_regex(p) AS INT)",
        # unicode (SQLite core). `quote()` is a non-shadowable Spark builtin
        # whose escaping differs (backslash vs doubled quote) — documented
        # delta, same purpose.
        "CREATE OR REPLACE TEMPORARY FUNCTION unicode(s STRING) RETURNS INT RETURN ascii(s)",
        # JSON1 family (README.md:698): json_array_length is a same-named
        # Spark builtin; `->`/`->>` are rewritten (dsq_spark.rewrite);
        # json_extract maps to get_json_object (single-path form; returns
        # TEXT where SQLite returns a dynamic value — documented delta, and
        # the dominant dsq usage is on string-serialized nested arrays
        # where TEXT matches).
        "CREATE OR REPLACE TEMPORARY FUNCTION json_extract(j STRING, p STRING) RETURNS STRING RETURN get_json_object(j, p)",
    ]
    for name, fn in date_parts.items():
        stmts.append(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(s STRING) "
            f"RETURNS INT RETURN {fn}(best_effort_ts(s))"
        )
    return stmts


def register_all(spark: SparkSession) -> None:
    """Register the extended function library on this session."""
    for stmt in _sql_udfs():
        spark.sql(stmt)


def _group_concat_alias(parts: list[str]) -> str:
    """SQLite group_concat(x[, sep]) / group_concat(DISTINCT x).

    The separator (default ',') may be any scalar expression, passed through
    to array_join verbatim. DISTINCT maps to collect_set; SQLite leaves
    concatenation order unspecified either way."""
    import re as _re

    first = parts[0].strip()
    m = _re.match(r"(?is)^DISTINCT\s+(.*)$", first)
    if m:
        inner = f"collect_set(CAST({m.group(1)} AS STRING))"
    else:
        inner = f"collect_list(CAST({first} AS STRING))"
    sep = parts[1].strip() if len(parts) > 1 else "','"
    return f"array_join({inner}, {sep})"


# Call-site aliases SQL UDFs can't express (aggregates, and variadic
# scalars like SQLite's format() == printf()); dsq_spark.rewrite rewrites
# these textually: name(args) → template.format(args=args), or — for
# aliases whose arguments have individual meaning (group_concat's optional
# separator) — a callable receiving the top-level-comma-split arg list.
AGG_ALIASES = {
    # SQLite layer-1 format() is C-style printf (README.md:698); Spark's
    # printf is the same family (%s/%d/%f). Spark's own format_* functions
    # are untouched (no word boundary after '_').
    "format": "printf({args})",
    "stdev": "stddev_samp({args})",
    "stddev": "stddev_samp({args})",
    "percentile_25": "percentile({args}, 0.25)",
    "percentile_50": "percentile({args}, 0.50)",
    "percentile_75": "percentile({args}, 0.75)",
    "percentile_90": "percentile({args}, 0.90)",
    "percentile_95": "percentile({args}, 0.95)",
    "percentile_99": "percentile({args}, 0.99)",
    "group_concat": _group_concat_alias,
    "total": "coalesce(sum({args}), 0.0d)",
}
