"""DDL classification + parsing (operator S6 of SURVEY.md §2).

Re-implements the semantics of the reference's regex classifier
``ExtractOperation`` (/root/reference/component/bean/pattern.go:36-64):
four case-insensitive statement families — TRUNCATE TABLE, CREATE
[TEMPORARY] TABLE [IF NOT EXISTS], DROP TABLE [IF EXISTS], ALTER TABLE —
each extracting optional ``schema`` and required ``table`` (backticks and
``schema.table`` qualification allowed); anything else is UNKNOWN and
dropped (listener.go:254-256). A statement with no schema falls back to
the session schema (listener.go:257-259).

Two surfaces:
- :func:`classify_ddl` — pure-Python, for the (tiny, collected) DDL rows
  on the driver inside batch apply.
- :func:`classify_ddl_cols` — Catalyst-native column expressions
  (``regexp_extract`` compiled once by codegen), for classifying DDL at
  DataFrame scale (the oracle-checked query path). No Python UDFs.

Beyond the reference (which only *classifies*), :func:`parse_alter` parses
the ALTER sub-commands our apply side must *execute* for schema evolution
(north rule): ADD COLUMN / RENAME COLUMN / MODIFY|CHANGE|ALTER COLUMN type.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same statement families as pattern.go:38-42 (named groups -> (?P<>)).
_IDENT = r"`?(?:(?P<schema>\w+)`?\.)?`?(?P<table>\w+)`?"
TRUNCATE_RE = rf"(?i)^\s*TRUNCATE\s+TABLE\s+{_IDENT}\s*;?$"
CREATE_RE = rf"(?i)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s*\((?s:.*)\).*;?$"
DROP_RE = rf"(?i)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_IDENT}\s*;?$"
ALTER_RE = rf"(?i)^\s*ALTER\s+TABLE\s+{_IDENT}\s+(?s:.+);?$"

_FAMILIES = [
    (re.compile(TRUNCATE_RE), "TRUNCATE"),
    (re.compile(CREATE_RE), "CREATE_TABLE"),
    (re.compile(DROP_RE), "DROP_TABLE"),
    (re.compile(ALTER_RE), "ALTER_TABLE"),
]

# Spark regexp_extract needs plain (non-named) groups; group indexes below
# match these patterns. Kept structurally identical to the Python ones.
_IDENT_G = r"`?(?:(\w+)`?\.)?`?(\w+)`?"
SPARK_PATTERNS = {
    "TRUNCATE": (rf"(?i)^\s*TRUNCATE\s+TABLE\s+{_IDENT_G}\s*;?$", 1, 2),
    "CREATE_TABLE": (rf"(?i)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT_G}\s*\((?s:.*)\).*;?$", 1, 2),
    "DROP_TABLE": (rf"(?i)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_IDENT_G}\s*;?$", 1, 2),
    "ALTER_TABLE": (rf"(?i)^\s*ALTER\s+TABLE\s+{_IDENT_G}\s+(?s:.+);?$", 1, 2),
}


def classify_ddl(query: str, session_schema: str = "") -> tuple[str, str, str, bool]:
    """(schema, table, operation, matched) — pattern.go:46-64 semantics."""
    for rx, op in _FAMILIES:
        m = rx.match(query)
        if m:
            schema = m.group("schema") or session_schema
            return schema, m.group("table"), op, True
    return "", "", "UNKNOWN", False


def ddl_matches_any(ddl: Column) -> Column:
    """True iff ``ddl`` matches one of the four statement families —
    the distributed pre-filter that keeps non-matching QUERY events
    (listener.go:254-256) from ever reaching the driver."""
    cond = None
    for pat, _gs, _gt in SPARK_PATTERNS.values():
        c = ddl.rlike(pat)
        cond = c if cond is None else (cond | c)
    return cond


def classify_ddl_cols(ddl: Column, session_schema: Column | None = None) -> list[Column]:
    """Columns [ddl_schema, ddl_table, ddl_op] classifying ``ddl`` at scale.

    Pure Catalyst (regexp_extract / when-chains): whole-stage codegen keeps
    this JVM-side; the regexes compile once per task, matching the
    reference's precompiled-at-init design (pattern.go:36-44).
    """
    op_col = F.lit("UNKNOWN")
    schema_col = F.lit("")
    table_col = F.lit("")
    # Evaluate families in reverse so earlier families take precedence.
    for op in ["ALTER_TABLE", "DROP_TABLE", "CREATE_TABLE", "TRUNCATE"]:
        pat, gs, gt = SPARK_PATTERNS[op]
        hit = ddl.rlike(pat)
        op_col = F.when(hit, F.lit(op)).otherwise(op_col)
        schema_col = F.when(hit, F.regexp_extract(ddl, pat, gs)).otherwise(schema_col)
        table_col = F.when(hit, F.regexp_extract(ddl, pat, gt)).otherwise(table_col)
    if session_schema is not None:
        # session-schema fallback applies only to *matched* statements
        # (listener.go:257-259 runs after a successful ExtractOperation)
        schema_col = F.when(
            (schema_col == "") & (op_col != "UNKNOWN"), session_schema
        ).otherwise(schema_col)
    return [schema_col.alias("ddl_schema"), table_col.alias("ddl_table"), op_col.alias("ddl_op")]


# ----------------------------------------------------------------- ALTER parsing

_ADD_RE = re.compile(
    r"(?i)ADD\s+(?:COLUMN\s+)?"
    r"(?!(?:INDEX|KEY|CONSTRAINT|PRIMARY|UNIQUE|FOREIGN|FULLTEXT|SPATIAL)\b)"
    r"`?(\w+)`?\s+([\w()0-9, ]+?)\s*;?\s*$"
)
_RENAME_RE = re.compile(r"(?i)RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*;?\s*$")
_DROPCOL_RE = re.compile(
    r"(?i)DROP\s+(?:COLUMN\s+)?"
    r"(?!(?:INDEX|KEY|CONSTRAINT|PRIMARY|UNIQUE|FOREIGN|PARTITION|CHECK)\b)"
    r"`?(\w+)`?\s*;?\s*$"
)
_MODIFY_RE = re.compile(r"(?i)(?:MODIFY|ALTER)\s+(?:COLUMN\s+)?`?(\w+)`?\s+(?:SET\s+DATA\s+TYPE\s+|TYPE\s+)?([\w()0-9, ]+?)\s*;?\s*$")

_MYSQL_TO_SPARK = {
    "int": "int", "integer": "int", "tinyint": "tinyint", "smallint": "smallint",
    "mediumint": "int", "bigint": "bigint", "float": "float", "double": "double",
    "text": "string", "varchar": "string", "char": "string", "json": "string",
    "blob": "binary", "date": "date", "datetime": "timestamp_ntz",
    "timestamp": "timestamp", "time": "string", "year": "int", "decimal": "decimal",
}


@dataclass
class AlterCommand:
    kind: str  # 'add' | 'rename' | 'modify' | 'drop' | 'other'
    column: str | None = None
    new_name: str | None = None
    type_: str | None = None


def _map_type(sql_type: str) -> str:
    t = sql_type.strip().lower()
    base = t.split("(")[0].strip()
    if base == "decimal":
        return t  # keep precision/scale
    return _MYSQL_TO_SPARK.get(base, "string")


@dataclass
class CreateCommand:
    schema: str
    table: str
    columns: list[tuple[str, str]]  # (name, spark sql type)
    key_cols: list[str]


_PK_RE = re.compile(r"(?i)PRIMARY\s+KEY\s*\(([^)]*)\)")
_COLDEF_RE = re.compile(r"^\s*`?(\w+)`?\s+([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)", )
_CONSTRAINT_WORDS = {"primary", "unique", "key", "index", "constraint", "foreign",
                     "fulltext", "spatial", "check"}


def _split_top_level(s: str) -> list[str]:
    """Split a CREATE TABLE column list on commas outside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def parse_create(stmt: str, session_schema: str = "") -> CreateCommand | None:
    """Parse a CREATE TABLE statement into the column specs + primary key
    the catalog needs to *execute* it (the reference only classifies and
    forwards CREATE — component/bean/query.go:25; the north rule applies).

    MySQL types map to Spark via the same table ALTER parsing uses;
    constraint clauses (PRIMARY KEY, KEY, CONSTRAINT, ...) are skipped as
    column defs but PRIMARY KEY(...) supplies the key columns (first
    column as fallback). Returns None for non-CREATE statements."""
    m = re.match(
        r"(?i)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        + _IDENT + r"\s*\((?P<body>(?s:.*))\)(?P<tail>[^)]*);?\s*$",
        stmt,
    )
    if not m:
        return None
    schema = m.group("schema") or session_schema
    table = m.group("table")
    cols: list[tuple[str, str]] = []
    for part in _split_top_level(m.group("body")):
        head = part.strip().split(None, 1)[0].lower() if part.strip() else ""
        if not head or head in _CONSTRAINT_WORDS:
            continue
        cm = _COLDEF_RE.match(part)
        if cm:
            cols.append((cm.group(1), _map_type(cm.group(2))))
    if not cols:
        return None
    pk = _PK_RE.search(m.group("body"))
    if pk:
        keys = [k.strip().strip("`") for k in pk.group(1).split(",") if k.strip()]
        names = {n for n, _ in cols}
        keys = [k for k in keys if k in names] or [cols[0][0]]
    else:
        keys = [cols[0][0]]
    return CreateCommand(schema, table, cols, keys)


def parse_alter(stmt: str) -> AlterCommand:
    """Parse the ALTER sub-command our apply side executes (north rule:
    add/rename/type-widen). Unrecognized forms -> kind='other' (logged,
    not applied — matching the reference's forward-only stance for them)."""
    rx = re.compile(r"(?i)^\s*ALTER\s+TABLE\s+" + _IDENT + r"\s+(?P<rest>(?s:.+?))\s*;?\s*$")
    m = rx.match(stmt)
    if not m:
        return AlterCommand("other")
    rest = m.group("rest")
    mm = _RENAME_RE.match(rest)
    if mm:
        return AlterCommand("rename", column=mm.group(1), new_name=mm.group(2))
    mm = _ADD_RE.match(rest)
    if mm:
        return AlterCommand("add", column=mm.group(1), type_=_map_type(mm.group(2)))
    mm = _DROPCOL_RE.match(rest)
    if mm:
        return AlterCommand("drop", column=mm.group(1))
    mm = _MODIFY_RE.match(rest)
    if mm:
        return AlterCommand("modify", column=mm.group(1), type_=_map_type(mm.group(2)))
    return AlterCommand("other")
