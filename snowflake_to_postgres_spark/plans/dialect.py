"""Snowflake SQL → Spark SQL dialect translation (SURVEY §2.6 F1-F18).

The reference rewrites Snowflake view SQL into Postgres SQL with regex
rules (view_procedure_translator.py). Spark needs far fewer rewrites —
IFF/NVL/IFNULL/DATE_TRUNC/CONCAT_WS/TO_DATE are native — so this layer
only translates what Spark genuinely spells differently, plus the
structural passes (view-DDL parse, 3-part name strip, cross-schema
detection, procedure stubs). Each rule notes its reference twin.

Rewrites:
  IFF(
      → IF(                        (F1 — Spark IF is native; no CASE needed)
  GETDATE()/SYSDATE()/CURRENT_TIMESTAMP() → current_timestamp()  (F3)
  DATEDIFF(part, a, b)             → TIMESTAMPDIFF(part, a, b)   (F7 — fixes
      the reference's knowingly-wrong DATE_PART rewrite)
  x::TYPE                          → CAST(x AS type)             (F12)
  [LATERAL] SPLIT_TO_TABLE(c, d)   → LATERAL VIEW explode(split(c, d))  (F9)
  Snowflake datetime format tokens → Spark tokens inside TO_DATE/
      TO_TIMESTAMP/TO_CHAR second args                           (F5)
  "DB"."SCHEMA"."TABLE"            → schema.table                (F15)
No-ops kept as documented identities: NVL, IFNULL, COALESCE, CONCAT_WS,
DATE_TRUNC, LPAD/RPAD (F10 — Spark pads any type), TRIM aliasing (F11 —
Spark names outputs distinctly).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# View DDL parsing (F18, view_procedure_translator.py:14-80)
# --------------------------------------------------------------------------

_VIEW_RE = re.compile(
    r"CREATE\s+(?:OR\s+REPLACE\s+)?(?:SECURE\s+)?(?:RECURSIVE\s+)?VIEW\s+"
    r"(?P<name>(?:\"[^\"]+\"|\w+)(?:\s*\.\s*(?:\"[^\"]+\"|\w+))*)\s*"
    r"(?P<cols>\([^)]*\))?\s*"
    r"(?:COMMENT\s*=\s*'[^']*'\s*)?"
    r"AS\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass
class TranslatedView:
    name: str
    spark_sql: str
    column_list: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


class ViewTranslationError(ValueError):
    pass


def parse_view_ddl(ddl: str) -> tuple[str, list[str], str]:
    """Extract (name, declared columns, body) from a Snowflake CREATE
    VIEW; unparseable DDL raises with a reason (the reference returns a
    failure record, view_procedure_translator.py:44-50)."""
    m = _VIEW_RE.match(ddl.strip())
    if not m:
        raise ViewTranslationError("not a parseable CREATE VIEW statement")
    name = m.group("name")
    cols = []
    if m.group("cols"):
        cols = [c.strip().strip('"') for c in m.group("cols")[1:-1].split(",") if c.strip()]
    return name, cols, m.group("body").strip()


# --------------------------------------------------------------------------
# Identifier passes (F15-F17)
# --------------------------------------------------------------------------

_THREE_PART = re.compile(r'"([^"]+)"\s*\.\s*"([^"]+)"\s*\.\s*"([^"]+)"')
_THREE_PART_BARE = re.compile(r"\b(\w+)\.(\w+)\.(\w+)\b")


def strip_db_prefix(sql: str) -> str:
    """'"DB"."SCHEMA"."TABLE"' → schema."table"
    (view_procedure_translator.py:82-91)."""
    sql = _THREE_PART.sub(lambda m: f'{m.group(2).lower()}."{m.group(3).lower()}"', sql)
    return _THREE_PART_BARE.sub(lambda m: f"{m.group(2).lower()}.{m.group(3).lower()}", sql)


_FROM_JOIN_RE = re.compile(
    r"\b(FROM|JOIN)\s+((?:\"[^\"]+\"|\w+)(?:\s*\.\s*(?:\"[^\"]+\"|\w+))?)",
    re.IGNORECASE,
)


def _cte_names(sql: str) -> set[str]:
    names = set()
    for m in re.finditer(r"(?:\bWITH\s+|,\s*)(\w+)\s+AS\s*\(", sql, re.IGNORECASE):
        names.add(m.group(1).lower())
    return names


def detect_cross_schema_refs(sql: str, home_schema: str) -> list[str]:
    """F17 (view_procedure_translator.py:122-144): qualified FROM/JOIN
    targets in another schema, reported for dependency planning. (At run
    time Catalyst's analyzer reports unresolved relations anyway.)"""
    out = []
    for m in _FROM_JOIN_RE.finditer(sql):
        target = m.group(2)
        if "." in target:
            schema = target.split(".")[0].strip().strip('"').lower()
            if schema != home_schema.lower():
                out.append(target.strip())
    return sorted(set(out))


def qualify_bare_tables(sql: str, schema: str) -> str:
    """F16 (view_procedure_translator.py:93-120): prefix unqualified
    FROM/JOIN tables; CTE names exempt. Only needed when views land in a
    real Spark database rather than temp views."""
    ctes = _cte_names(sql)
    keywords = {"select", "lateral", "unnest", "values", "table"}

    def repl(m: re.Match) -> str:
        kw, target = m.group(1), m.group(2)
        base = target.strip().strip('"').lower()
        if "." in target or base in ctes or base in keywords:
            return m.group(0)
        return f"{kw} {schema}.{target}"

    return _FROM_JOIN_RE.sub(repl, sql)


# --------------------------------------------------------------------------
# Function rewrites (F1-F12)
# --------------------------------------------------------------------------

_CAST_TYPE_MAP = {
    "VARCHAR": "STRING",
    "STRING": "STRING",
    "TEXT": "STRING",
    "CHAR": "STRING",
    "NUMBER": "DECIMAL(38,0)",
    "NUMERIC": "DECIMAL(38,0)",
    "INT": "INT",
    "INTEGER": "INT",
    "BIGINT": "BIGINT",
    "FLOAT": "DOUBLE",
    "DOUBLE": "DOUBLE",
    "DATE": "DATE",
    "TIMESTAMP": "TIMESTAMP",
    "TIMESTAMP_NTZ": "TIMESTAMP_NTZ",
    "BOOLEAN": "BOOLEAN",
    "VARIANT": "STRING",
}

# x::TYPE or x::TYPE(p[,s]) where x is an identifier, quoted identifier,
# function call without nested parens, or parenthesized expression.
_DCOLON_RE = re.compile(
    r'((?:"[^"]+"|\w+(?:\([^()]*\))?|\([^()]*\)))\s*::\s*([A-Za-z_]+)(\(\s*\d+(?:\s*,\s*\d+)?\s*\))?'
)


def rewrite_double_colon_casts(sql: str) -> str:
    """F12 (view_procedure_translator.py:310-312): ``x::NUMBER(10,2)`` →
    ``CAST(x AS DECIMAL(10,2))``; bare NUMBER → DECIMAL(38,0)."""

    def repl(m: re.Match) -> str:
        expr, typ, params = m.group(1), m.group(2).upper(), m.group(3)
        if params and typ in ("NUMBER", "NUMERIC", "DECIMAL"):
            target = f"DECIMAL{params}"
        elif params and typ in ("VARCHAR", "CHAR"):
            target = "STRING"
        else:
            target = _CAST_TYPE_MAP.get(typ, typ)
        return f"CAST({expr} AS {target})"

    prev = None
    while prev != sql:  # nested casts resolve innermost-out
        prev, sql = sql, _DCOLON_RE.sub(repl, sql)
    return sql


_FORMAT_TOKENS = [
    ("YYYY", "yyyy"), ("YY", "yy"), ("MON", "MMM"), ("MM", "MM"),
    ("DD", "dd"), ("HH24", "HH"), ("HH12", "hh"), ("MI", "mm"),
    ("SS", "ss"), ("FF9", "SSSSSSSSS"), ("FF6", "SSSSSS"), ("FF3", "SSS"),
    ("FF", "SSSSSS"), ("TZH", "xx"), ("AM", "a"), ("PM", "a"),
]


def translate_format_string(fmt: str) -> str:
    """Snowflake datetime format → Spark (JDK) pattern (F5)."""
    out = fmt
    for sf, spark in _FORMAT_TOKENS:
        out = re.sub(sf, spark, out, flags=re.IGNORECASE if sf not in ("MM", "MI") else 0)
    return out


_TOFMT_RE = re.compile(
    r"\b(TO_DATE|TO_TIMESTAMP|TO_CHAR|TO_VARCHAR)\s*\(([^,()]+(?:\([^()]*\))?[^,()]*),\s*'([^']*)'\s*\)",
    re.IGNORECASE,
)


def rewrite_datetime_formats(sql: str) -> str:
    def repl(m: re.Match) -> str:
        fn = m.group(1).upper()
        fn = {"TO_CHAR": "DATE_FORMAT", "TO_VARCHAR": "DATE_FORMAT"}.get(fn, fn)
        return f"{fn}({m.group(2)}, '{translate_format_string(m.group(3))}')"

    return _TOFMT_RE.sub(repl, sql)


_STT_STOPWORDS = "WHERE|GROUP|ORDER|HAVING|ON|JOIN|LEFT|RIGHT|INNER|FULL|CROSS|LIMIT|UNION|QUALIFY"
_SPLIT_TO_TABLE_RE = re.compile(
    r"(?:,\s*)?(?:LATERAL\s+|TABLE\s*\(\s*)?SPLIT_TO_TABLE\s*\(([^,]+),\s*([^)]+)\)\s*\)?"
    rf"(?:\s*(?:AS\s+)?(?!(?:{_STT_STOPWORDS})\b)(\w+)(?:\s*\(\s*([\w\s,]+)\s*\))?)?",
    re.IGNORECASE,
)


def rewrite_split_to_table(sql: str) -> str:
    """F9 (view_procedure_translator.py:282-295): [LATERAL]
    SPLIT_TO_TABLE(col, d) → LATERAL VIEW explode(split(col, d)). The
    emitted table/column aliases preserve Snowflake's (alias.value)."""

    def repl(m: re.Match) -> str:
        col, delim = m.group(1).strip(), m.group(2).strip()
        alias = m.group(3) or "_stt"
        col_alias = "value"
        if m.group(4):
            cols = [c.strip() for c in m.group(4).split(",")]
            col_alias = cols[-1] if cols else "value"
        return f" LATERAL VIEW explode(split({col}, {delim})) {alias} AS {col_alias}"

    return _SPLIT_TO_TABLE_RE.sub(repl, sql)


_SIMPLE_FN_REWRITES = [
    (re.compile(r"\bIFF\s*\(", re.IGNORECASE), "IF("),            # F1
    (re.compile(r"\bGETDATE\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),  # F3
    (re.compile(r"\bSYSDATE\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),  # F3
    (re.compile(r"\bDATEDIFF\s*\(", re.IGNORECASE), "TIMESTAMPDIFF("),  # F7
]


def rewrite_functions(sql: str) -> str:
    for pat, repl in _SIMPLE_FN_REWRITES:
        sql = pat.sub(repl, sql)
    return sql


_TOP_RE = re.compile(r"\bSELECT\s+TOP\s+(\d+)\b", re.IGNORECASE)


def rewrite_top(sql: str) -> str:
    """Snowflake/T-SQL ``SELECT TOP n`` → trailing ``LIMIT n`` (applied
    once, to the first block — TOP is a single-block construct)."""
    m = _TOP_RE.search(sql)
    if not m:
        return sql
    out = sql[: m.start()] + "SELECT" + sql[m.end():]
    return out.rstrip().rstrip(";") + f" LIMIT {m.group(1)}"


def rewrite_minus(sql: str) -> str:
    """Snowflake/Oracle ``MINUS`` → ANSI ``EXCEPT`` (word-level; Spark
    has no MINUS)."""
    return re.sub(r"\bMINUS\b", "EXCEPT", sql, flags=re.IGNORECASE)


_SAMPLE_RE = re.compile(
    r"\bSAMPLE\s*(?:ROW\s*)?\(\s*(\d+(?:\.\d+)?)\s*(ROWS?)?\s*\)", re.IGNORECASE
)


def rewrite_sample(sql: str) -> str:
    """Snowflake ``SAMPLE (n)`` / ``SAMPLE (n ROWS)`` → Spark
    ``TABLESAMPLE (n PERCENT)`` / ``LIMIT``-style row sample. Row-count
    form maps to ``TABLESAMPLE (n ROWS)`` (supported by Spark);
    fraction form to ``TABLESAMPLE (n PERCENT)``. Sampling is
    non-deterministic in both dialects — translation preserves the
    semantics class, not row identity."""

    def repl(m: re.Match) -> str:
        n, rows = m.group(1), m.group(2)
        if rows:
            return f"TABLESAMPLE ({n} ROWS)"
        return f"TABLESAMPLE ({n} PERCENT)"

    return _SAMPLE_RE.sub(repl, sql)


def _top_level_find(sql: str, word_pattern: str, start: int = 0):
    """First match of ``word_pattern`` at paren depth 0, or None."""
    depth = 0
    for m in re.finditer(rf"[()]|{word_pattern}", sql[start:], re.IGNORECASE):
        t = m.group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            return (start + m.start(), start + m.end())
    return None


def rewrite_qualify(sql: str) -> str:
    """Snowflake QUALIFY → ANSI subquery filter (Spark has no QUALIFY).

    ``SELECT <list> FROM … QUALIFY <pred(window)> [ORDER BY/LIMIT …]``
    becomes::

        SELECT * EXCEPT (__qualify_0, …) FROM (
          SELECT <list>, <window_expr> AS __qualify_0, … FROM …
        ) WHERE <pred with window refs replaced> [ORDER BY/LIMIT …]

    Window expressions inside the predicate are hoisted into the inner
    select list (they are illegal in WHERE), and the star-EXCEPT keeps
    the helper columns out of the result — matching QUALIFY's column
    semantics. Only top-level QUALIFY is rewritten (one per query
    block, like Snowflake)."""
    q = _top_level_find(sql, r"\bQUALIFY\b")
    if q is None:
        return sql
    head = sql[: q[0]].rstrip()
    rest = sql[q[1]:]
    t = _top_level_find(rest, r"\bORDER\s+BY\b|\bLIMIT\b")
    cut = t[0] if t else len(rest)
    pred, tail = rest[:cut].strip(), rest[cut:]

    # hoist window expressions fn(...) OVER (...) out of the predicate
    win_open = re.compile(r"\b\w+\s*\([^()]*\)\s*OVER\s*\(", re.IGNORECASE)
    helpers: list[tuple[str, str]] = []
    out: list[str] = []
    i = 0
    while True:
        m = win_open.search(pred, i)
        if not m:
            out.append(pred[i:])
            break
        j, depth = m.end(), 1
        while j < len(pred) and depth:
            if pred[j] == "(":
                depth += 1
            elif pred[j] == ")":
                depth -= 1
            j += 1
        alias = f"__qualify_{len(helpers)}"
        helpers.append((pred[m.start():j], alias))
        out.append(pred[i:m.start()])
        out.append(alias)
        i = j
    new_pred = "".join(out)

    if helpers:
        f = _top_level_find(head, r"\bFROM\b")
        if f is None:  # malformed; leave untouched
            return sql
        helper_sql = ", ".join(f"{e} AS {a}" for e, a in helpers)
        inner = f"{head[:f[0]].rstrip()}, {helper_sql} {head[f[0]:]}"
        except_list = ", ".join(a for _, a in helpers)
        return (
            f"SELECT * EXCEPT ({except_list}) FROM (\n{inner}\n) "
            f"WHERE {new_pred}{tail}"
        )
    return f"SELECT * FROM (\n{head}\n) WHERE {new_pred}{tail}"


# --------------------------------------------------------------------------
# Pipeline
# --------------------------------------------------------------------------

def translate_body(sql: str, home_schema: str = "public") -> tuple[str, list[str]]:
    """Apply the rewrite pipeline to a view body; returns (spark_sql,
    warnings) — warnings carry cross-schema refs (F17)."""
    warnings = []
    refs = detect_cross_schema_refs(sql, home_schema)
    if refs:
        warnings.append(f"cross-schema references: {refs}")
    sql = strip_db_prefix(sql)
    sql = rewrite_split_to_table(sql)
    sql = rewrite_datetime_formats(sql)
    sql = rewrite_double_colon_casts(sql)
    sql = rewrite_functions(sql)
    sql = rewrite_top(sql)
    sql = rewrite_minus(sql)
    sql = rewrite_sample(sql)
    sql = rewrite_qualify(sql)
    return sql, warnings


def translate_view(ddl: str, home_schema: str = "public") -> TranslatedView:
    """Full F18 pipeline → Spark ``CREATE OR REPLACE TEMPORARY VIEW``
    (view_procedure_translator.py:14-80)."""
    name, cols, body = parse_view_ddl(ddl)
    short = name.split(".")[-1].strip('"').lower()
    spark_body, warnings = translate_body(body, home_schema)
    col_list = f" ({', '.join(cols)})" if cols else ""
    sql = f"CREATE OR REPLACE TEMPORARY VIEW {short}{col_list} AS\n{spark_body}"
    return TranslatedView(short, sql, cols, warnings)


def translate_procedure_stub(name: str, ddl: str) -> str:
    """F19 (view_procedure_translator.py:343-383): procedures require
    manual translation — emit the same commented stub policy."""
    header = "\n".join("-- " + line for line in ddl.strip().splitlines()[:10])
    return (
        f"-- PROCEDURE {name}: requires manual translation to a PySpark job\n"
        f"-- (Snowflake procedures have no Spark analog; original DDL below)\n"
        f"{header}\n"
    )
