"""Catalyst-native fast path for SIMPLE JSON1 mutator calls.

The general json_set/json_insert/json_replace engine is a real JSON
mutation engine behind an Arrow-batched Pandas UDF (functions/json1.py)
— the one deliberate Python hop in the function library.  The COMMON
call shape, though, is `json_set(j, '$.key', <scalar literal>)`: a
single top-level key and a scalar.  For that shape this module builds
pure-SQL char-level state machines (aggregate() HOFs over
`split(j, '')`, same technique as the glob compiler) that reproduce
SQLite's byte-exact output — registered as SQL UDFs
``dsq_json_set1/insert1/replace1(j, key, valjson)`` so the alias layer
emits a plain call (no lambda text ever enters the rewriter).

Two machines, because the naive one is QUADRATIC (measured: 2.3 s vs
the Python engine's 0.5 s on 2k × 13 KB docs — string-concat
accumulation copies the prefix on every char):

* the POSITION machine carries no output string — only char positions
  (first content char, matched value span, root-close, last content
  char) and a `ws` flag for whitespace outside strings.  For documents
  with no such whitespace (machine-written JSON, the overwhelming case)
  the result is two/three SUBSTRING splices: O(n), stays in codegen.
* the MINIFY machine is the naive accumulator, evaluated lazily ONLY
  when `ws` is set (SQLite re-serializes minified, so whitespace forces
  a full rebuild).

SQLite JSON1 output contract (probed vs sqlite3 3.40, pinned in
tests/test_json1.py::test_json_mutator_fast_path_matrix):

* the WHOLE document is re-serialized minified (`{ "a" : 1 }` →
  `{"a":1}`); untouched NUMBER spellings (`1e0`, `0.10`) and STRING
  bytes incl. escapes (`"\\u0041"`) are preserved verbatim;
* a matched top-level key's value is replaced in place; a missing key
  appends `,"key":val` before the closing `}` (`{}` → `{"key":val}`);
* a non-object root (array, scalar, `null`) is a NO-OP for `$.key`;
* json_insert never replaces, json_replace never appends;
* malformed JSON → NULL (this engine's default-mode behavior; strict
  mode keeps the raising Python engine, so the fast path is only
  emitted when DSQ_STRICT_JSON is off).

Known residual (documented, exotic): a top-level key spelled with
ESCAPES in the document (`"\\u0062"` for `b`) compares verbatim here
and so does not match, while SQLite matches the decoded key.

State fields shared by both machines:
  d   structural depth (strings excluded)
  s   inside a string (copy mode)            e   backslash-escape pending
  ek  expecting a KEY at the root layer      k   current key accumulator
  pm  key just matched, awaiting ':'         m   0 search / 1 skip /
  sd  container depth in a skipped value         2 replaced / 3 found
  ss  in-string inside skip                  ro  root is an object
  st  first non-ws char seen                 an  root has ≥1 member
position machine only:
  i   chars consumed so far                  fs  first content char pos
  le  last content char pos                  ws  minify required
  vs  ':' of the matched key                 ve  last char of old value
  cl  root '}' position
"""

from __future__ import annotations

import re as _re

_WS = "({c} = ' ' OR {c} = '\\t' OR {c} = '\\n' OR {c} = '\\r')"
BSL = "'\\\\'"   # one backslash after Spark's literal parsing
QT = "'\"'"      # double-quote char
OB = "'{'"       # object open
CB = "'}'"       # object close
AB = "'['"       # array open
AE = "']'"       # array close


def _mk_st(fields, defaults):
    def st(**kw: str) -> str:
        parts = []
        for f in fields:
            parts.append(f"'{f}', " + kw.get(f, defaults.get(f, f"a.{f}")))
        return "named_struct(" + ", ".join(parts) + ")"
    return st


# ---------------------------------------------------------------------------
# MINIFY machine: accumulates the output string (quadratic; whitespace-
# carrying documents only).
# ---------------------------------------------------------------------------

_MIN_FIELDS = ("o", "d", "s", "e", "ek", "k", "pm", "m", "sd", "ss",
               "ro", "st", "an")
_MIN_INIT = ("named_struct('o', '', 'd', 0, 's', false, 'e', false, "
             "'ek', false, 'k', CAST(NULL AS STRING), 'pm', false, "
             "'m', 0, 'sd', 0, 'ss', false, 'ro', false, 'st', false, "
             "'an', false)")


def _minify_transition(replace: bool, append: bool) -> str:
    st = _mk_st(_MIN_FIELDS, {})
    ws = _WS.format(c="c")
    kcat = "CASE WHEN a.k IS NULL THEN CAST(NULL AS STRING) ELSE a.k || c END"
    skip_str = (
        "CASE "
        + f"WHEN a.e THEN {st(e='false')} "
        + f"WHEN c = {BSL} THEN {st(e='true')} "
        + f"WHEN c = {QT} THEN CASE WHEN a.sd = 0 "
        + f"THEN {st(ss='false', m='2')} ELSE {st(ss='false')} END "
        + f"ELSE {st()} END")
    skip = (
        "CASE "
        + f"WHEN {ws} THEN {st()} "
        + f"WHEN c = {QT} THEN {st(ss='true', e='false')} "
        + f"WHEN c = {OB} OR c = {AB} THEN {st(sd='a.sd + 1')} "
        + f"WHEN (c = {CB} OR c = {AE}) AND a.sd > 1 THEN "
        + f"{st(sd='a.sd - 1')} "
        + f"WHEN (c = {CB} OR c = {AE}) AND a.sd = 1 THEN "
        + f"{st(sd='0', m='2')} "
        # a scalar old value runs to the ROOT close: emit the brace, done
        + f"WHEN c = {CB} THEN {st(m='2', d='a.d - 1', o='a.o || c')} "
        + "WHEN c = ',' AND a.sd = 0 THEN "
        + f"{st(m='2', o='a.o || c', ek='true')} "
        + f"ELSE {st()} END")
    copy_str = (
        "CASE "
        + f"WHEN a.e THEN {st(o='a.o || c', e='false', k=kcat, an='true')} "
        + f"WHEN c = {BSL} THEN "
        + f"{st(o='a.o || c', e='true', k=kcat, an='true')} "
        + f"WHEN c = {QT} THEN "
        + st(o="a.o || c", s="false", k="CAST(NULL AS STRING)",
             pm="(a.k IS NOT NULL AND a.k = kk AND a.m = 0)", an="true")
        + f" ELSE {st(o='a.o || c', k=kcat, an='true')} END")
    if replace:
        on_match = st(o="a.o || ':' || vj", pm="false", m="1", sd="0",
                      ss="false", ek="false")
    else:  # insert: key exists → keep the old value, just stop searching
        on_match = st(o="a.o || c", pm="false", m="3", ek="false")
    arms = [
        f"WHEN {ws} THEN {st()}",
        (f"WHEN c = {QT} THEN " +
         st(o="a.o || c", s="true", e="false", an="true",
            k="CASE WHEN a.d = 1 AND a.ro AND a.ek AND a.m = 0 "
              "THEN '' ELSE CAST(NULL AS STRING) END")),
        (f"WHEN c = {OB} THEN " +
         st(o="a.o || c", d="a.d + 1", ro="a.ro OR NOT a.st", st="true",
            ek="CASE WHEN NOT a.st THEN true ELSE a.ek END",
            an="a.an OR a.d >= 1")),
        (f"WHEN c = {AB} THEN " +
         st(o="a.o || c", d="a.d + 1", st="true", an="a.an OR a.d >= 1")),
    ]
    if append:
        arms.append(
            f"WHEN c = {CB} AND a.d = 1 AND a.ro AND a.m = 0 THEN " +
            st(o="a.o || CASE WHEN a.an THEN ',' ELSE '' END || "
                 f"{QT} || kk || concat({QT}, ':') || vj || {CB}",
               d="0", m="2"))
    arms += [
        (f"WHEN c = {CB} OR c = {AE} THEN " +
         st(o="a.o || c", d="a.d - 1", an="a.an OR a.d > 1")),
        f"WHEN c = ':' AND a.d = 1 AND a.pm THEN {on_match}",
        f"WHEN c = ':' THEN {st(o='a.o || c', ek='false')}",
        ("WHEN c = ',' THEN " +
         st(o="a.o || c",
            ek="CASE WHEN a.d = 1 THEN true ELSE a.ek END")),
        f"ELSE {st(o='a.o || c', an='a.an OR a.d >= 1')}",
    ]
    copy = "CASE " + " ".join(arms) + " END"
    return (f"CASE WHEN a.m = 1 AND a.ss THEN {skip_str} "
            f"WHEN a.m = 1 THEN {skip} "
            f"WHEN a.s THEN {copy_str} "
            f"ELSE {copy} END")


def _minify_expr(replace: bool, append: bool) -> str:
    """The full minify-fold over j, with lambda vars b/ch so it can nest
    inside the position machine's finish lambda (var a)."""
    trans = _minify_transition(replace, append)
    trans = _re.sub(r"\ba\.", "b.", trans)
    trans = _re.sub(r"\bc\b", "ch", trans)
    return (f"aggregate(split(j, ''), {_MIN_INIT}, "
            f"(b, ch) -> {trans}, b -> b.o)")


# ---------------------------------------------------------------------------
# POSITION machine: no output accumulation — O(n) — plus substring splices.
# ---------------------------------------------------------------------------

_POS_FIELDS = ("i", "d", "s", "e", "ek", "k", "pm", "m", "sd", "ss",
               "ro", "st", "an", "fs", "le", "ws", "vs", "ve", "cl")
_POS_INIT = ("named_struct('i', 0, 'd', 0, 's', false, 'e', false, "
             "'ek', false, 'k', CAST(NULL AS STRING), 'pm', false, "
             "'m', 0, 'sd', 0, 'ss', false, 'ro', false, 'st', false, "
             "'an', false, 'fs', 0, 'le', 0, 'ws', false, 'vs', 0, "
             "'ve', 0, 'cl', 0)")

# defaults for CONTENT chars: index bumps, last-content and first-content
# positions track (current char position = a.i + 1)
_POS_DEFAULTS = {
    "i": "a.i + 1",
    "le": "a.i + 1",
    "fs": "CASE WHEN a.fs = 0 THEN a.i + 1 ELSE a.fs END",
}


def _pos_transition(replace: bool, append: bool) -> str:
    st = _mk_st(_POS_FIELDS, _POS_DEFAULTS)
    ws = _WS.format(c="c")
    kcat = "CASE WHEN a.k IS NULL THEN CAST(NULL AS STRING) ELSE a.k || c END"
    # whitespace arms: index bumps, le/fs do NOT; `ws` set only INSIDE
    # the root (leading/trailing document whitespace splices away)
    ws_upd = st(i="a.i + 1", le="a.le", fs="a.fs",
                ws="a.ws OR (a.st AND a.d >= 1)")
    skip_str = (
        "CASE "
        + f"WHEN a.e THEN {st(e='false')} "
        + f"WHEN c = {BSL} THEN {st(e='true')} "
        + f"WHEN c = {QT} THEN CASE WHEN a.sd = 0 "
        + f"THEN {st(ss='false', m='2', ve='a.i + 1')} "
        + f"ELSE {st(ss='false')} END "
        + f"ELSE {st()} END")
    skip = (
        "CASE "
        + f"WHEN {ws} THEN {ws_upd} "
        + f"WHEN c = {QT} THEN {st(ss='true', e='false')} "
        + f"WHEN c = {OB} OR c = {AB} THEN {st(sd='a.sd + 1')} "
        + f"WHEN (c = {CB} OR c = {AE}) AND a.sd > 1 THEN "
        + f"{st(sd='a.sd - 1')} "
        + f"WHEN (c = {CB} OR c = {AE}) AND a.sd = 1 THEN "
        + f"{st(sd='0', m='2', ve='a.i + 1')} "
        # scalar old value runs to the ROOT close ('}' stays in the tail)
        + f"WHEN c = {CB} THEN "
        + f"{st(m='2', d='a.d - 1', ve='a.i', cl='a.i + 1')} "
        + "WHEN c = ',' AND a.sd = 0 THEN "
        + f"{st(m='2', ve='a.i', ek='true')} "
        + f"ELSE {st()} END")
    copy_str = (
        "CASE "
        + f"WHEN a.e THEN {st(e='false', k=kcat, an='true')} "
        + f"WHEN c = {BSL} THEN {st(e='true', k=kcat, an='true')} "
        + f"WHEN c = {QT} THEN "
        + st(s="false", k="CAST(NULL AS STRING)",
             pm="(a.k IS NOT NULL AND a.k = kk AND a.m = 0)", an="true")
        + f" ELSE {st(k=kcat, an='true')} END")
    if replace:
        on_match = st(pm="false", m="1", sd="0", ss="false", ek="false",
                      vs="a.i + 1")
    else:
        on_match = st(pm="false", m="3", ek="false")
    arms = [
        f"WHEN {ws} THEN {ws_upd}",
        (f"WHEN c = {QT} THEN " +
         st(s="true", e="false", an="true",
            k="CASE WHEN a.d = 1 AND a.ro AND a.ek AND a.m = 0 "
              "THEN '' ELSE CAST(NULL AS STRING) END")),
        (f"WHEN c = {OB} THEN " +
         st(d="a.d + 1", ro="a.ro OR NOT a.st", st="true",
            ek="CASE WHEN NOT a.st THEN true ELSE a.ek END",
            an="a.an OR a.d >= 1")),
        (f"WHEN c = {AB} THEN " +
         st(d="a.d + 1", st="true", an="a.an OR a.d >= 1")),
        (f"WHEN c = {CB} AND a.d = 1 THEN " +
         st(d="0", cl="a.i + 1")),
        (f"WHEN c = {CB} OR c = {AE} THEN " +
         st(d="a.d - 1", an="a.an OR a.d > 1")),
        f"WHEN c = ':' AND a.d = 1 AND a.pm THEN {on_match}",
        f"WHEN c = ':' THEN {st(ek='false')}",
        ("WHEN c = ',' THEN " +
         st(ek="CASE WHEN a.d = 1 THEN true ELSE a.ek END")),
        f"ELSE {st(an='a.an OR a.d >= 1')}",
    ]
    copy = "CASE " + " ".join(arms) + " END"
    return (f"CASE WHEN a.m = 1 AND a.ss THEN {skip_str} "
            f"WHEN a.m = 1 THEN {skip} "
            f"WHEN a.s THEN {copy_str} "
            f"ELSE {copy} END")


def _finish(replace: bool, append: bool) -> str:
    """Finish lambda: splice via substrings, or fall to the minify fold
    when whitespace outside strings demands a full rebuild."""
    arms = [
        f"WHEN a.ws THEN {_minify_expr(replace, append)}",
        # replaced in place: head (… through ':'), new value, tail
        ("WHEN a.m = 2 THEN substr(j, a.fs, a.vs - a.fs + 1) || vj || "
         "substr(j, a.ve + 1, a.le - a.ve)"),
    ]
    if append:
        arms.append(
            "WHEN a.m = 0 AND a.ro AND a.cl > 0 THEN "
            "substr(j, a.fs, a.cl - a.fs) || "
            "CASE WHEN a.an THEN ',' ELSE '' END || "
            f"{QT} || kk || concat({QT}, ':') || vj || {CB}")
    arms.append("ELSE substr(j, a.fs, a.le - a.fs + 1)")
    return "CASE " + " ".join(arms) + " END"


def fast_mutator_udfs() -> list[str]:
    """CREATE FUNCTION statements for the three fast mutators."""
    out = []
    for name, replace, append in (("set1", True, True),
                                  ("insert1", False, True),
                                  ("replace1", True, False)):
        trans = _pos_transition(replace, append)
        body = (
            "CASE WHEN j IS NULL OR kk IS NULL THEN CAST(NULL AS STRING) "
            # default-mode malformed → NULL (the valid JSON literal null
            # root is NOT malformed and is a no-op for '$.key')
            "WHEN get_json_object(j, '$') IS NULL AND trim(j) <> 'null' "
            "THEN CAST(NULL AS STRING) "
            f"ELSE aggregate(split(j, ''), {_POS_INIT}, "
            f"(a, c) -> {trans}, a -> {_finish(replace, append)}) END")
        out.append(
            f"CREATE OR REPLACE TEMPORARY FUNCTION dsq_json_{name}"
            f"(j STRING, kk STRING, vj STRING) RETURNS STRING "
            f"RETURN {body}")
    return out
