"""Vectorized decode of reference-shaped bean JSON (operators S4/S7).

The reference serializes every change as a JSON "bean" — envelope
``{Schema, Table, Operation}`` plus one of ``Inserted: [row...]``,
``Updated: [{Before, After}...]``, ``Deleted: [row...]``, ``Query``
(/root/reference/component/bean/{bean,insert,update,delete,query}.go;
golden bodies in README.md:109-240). Its decode zips positional rows with
column names one event at a time in Go (bean.go:152-181).

Here the whole path is Catalyst: ``from_json`` with a typed envelope
schema, then a single ``explode`` unifying the three payload shapes into
flat per-row-change records — JVM-side, whole-stage-codegen, Arrow-free
and Python-free (per BASELINE.json input_hint: no per-row Python).
Multi-row events (DataSlice, bean.go:40) become multiple output rows with
``row_idx`` preserving intra-event order; Update events yield paired
before/after (even=Before, odd=After pairing of bean.go:164-181 arrives
already-paired in JSON, and we keep it paired — the flat-alternating
variant is operators/pairing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def envelope_schema_ddl(row_ddl: str) -> str:
    """Envelope schema for a given row struct DDL, e.g.
    ``row_ddl='repo string, path string'``."""
    row = f"struct<{row_ddl}>"
    return (
        f"Schema string, Table string, Operation string, "
        f"Inserted array<{row}>, "
        f"Updated array<struct<Before:{row},After:{row}>>, "
        f"Deleted array<{row}>, "
        f"Query string"
    )


def decode_bean_json(df: DataFrame, payload_col: str, row_ddl: str) -> DataFrame:
    """payload JSON -> one row per row-change:
    (schema_name, table_name, op, row_idx, before, after, ddl).

    INSERT rows land in ``after``, DELETE rows in ``before``, UPDATE in
    both; Query beans yield one row with ``ddl`` set. Unparseable payloads
    yield op NULL (callers filter), mirroring the reference's skip of
    undecodable events.
    """
    env = F.from_json(F.col(payload_col), envelope_schema_ddl(row_ddl))
    null_row = F.lit(None).cast(f"struct<{row_ddl}>")
    mk = lambda b, a: F.struct(b.alias("before"), a.alias("after"))  # noqa: E731
    items = (
        F.when(
            env["Operation"] == "INSERT",
            F.transform(env["Inserted"], lambda r: mk(null_row, r)),
        )
        .when(
            env["Operation"] == "DELETE",
            F.transform(env["Deleted"], lambda r: mk(r, null_row)),
        )
        .when(
            env["Operation"] == "UPDATE",
            F.transform(env["Updated"], lambda p: mk(p["Before"], p["After"])),
        )
        .otherwise(F.array(mk(null_row, null_row)))
    )
    return df.select(
        "*",
        env["Schema"].alias("schema_name"),
        env["Table"].alias("table_name"),
        env["Operation"].alias("op"),
        env["Query"].alias("ddl"),
        F.posexplode_outer(items).alias("row_idx", "_pair"),
    ).select(
        *df.columns,
        "schema_name",
        "table_name",
        "op",
        "row_idx",
        F.col("_pair.before").alias("before"),
        F.col("_pair.after").alias("after"),
        "ddl",
    )


def load_table_metadata(columns_df: DataFrame) -> dict[tuple[str, str], list[str]]:
    """The DbMetadata loader (true S4 prerequisite): an
    INFORMATION_SCHEMA.COLUMNS-shaped DataFrame
    (table_schema, table_name, column_name, ordinal_position) -> the
    three-level ordinal-name map the reference loads once at startup
    (/root/reference/component/database/db_metadata.go:85-118, query with
    ORDER BY ORDINAL_POSITION at :87). Bounded driver traffic: one row per
    column of each observed table."""
    out: dict[tuple[str, str], list[tuple[int, str]]] = {}
    for r in columns_df.select("table_schema", "table_name", "column_name",
                               "ordinal_position").collect():
        out.setdefault((r["table_schema"], r["table_name"]), []).append(
            (r["ordinal_position"], r["column_name"])
        )
    return {k: [name for _, name in sorted(v)] for k, v in out.items()}


def decode_positional(
    df: DataFrame,
    column_names: list[str],
    rows_col: str = "rows",
    op_col: str = "op",
) -> DataFrame:
    """True S4: positional row decode — binlog-native ``[][]any`` rows
    zipped with ordinal column names (createValues, bean.go:152-162).

    ``df`` carries one event per row: ``op`` (INSERT/UPDATE/DELETE) and
    ``rows_col: array<array<string>>`` — the i-th inner value binds to
    ``column_names[i]``. UPDATE events carry *alternating* before/after
    rows (even=Before, odd=After — createUpdatePairs, bean.go:164-181).
    Output: one row per row-change with ``row_idx``, ``before``/``after``
    structs. Pure Catalyst (element_at/filter/zip_with over arrays inside
    whole-stage codegen): the plan binds the column list at compile time,
    exactly as the reference binds DbMetadata once at startup — no Python.
    """
    def zip_row(r):
        return F.struct(*[F.element_at(r, i + 1).alias(c)
                          for i, c in enumerate(column_names)])

    null_row = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:string" for c in column_names) + ">"
    )
    rows = F.col(rows_col)
    op = F.col(op_col)
    mk = lambda b, a: F.struct(b.alias("before"), a.alias("after"))  # noqa: E731
    # UPDATE: alternating rows -> pairs. The two-arg lambda of F.filter
    # binds the element index (the same binding that makes two-arg
    # F.transform a foot-gun elsewhere — here it is the point).
    befores = F.filter(rows, lambda x, i: i % 2 == 0)
    afters = F.filter(rows, lambda x, i: i % 2 == 1)
    items = (
        F.when(op == "INSERT", F.transform(rows, lambda r: mk(null_row, zip_row(r))))
        .when(op == "DELETE", F.transform(rows, lambda r: mk(zip_row(r), null_row)))
        .when(op == "UPDATE",
              F.zip_with(befores, afters, lambda b, a: mk(zip_row(b), zip_row(a))))
        .otherwise(F.array())
    )
    return df.select(
        "*", F.posexplode_outer(items).alias("row_idx", "_pair")
    ).select(
        *df.columns,
        "row_idx",
        F.col("_pair.before").alias("before"),
        F.col("_pair.after").alias("after"),
    ).drop(rows_col)


def encode_bean_json(schema_name: Column, table_name: Column, op: Column,
                     before: Column, after: Column) -> Column:
    """Inverse surface (S7 serialize analogue) for tests/debug: a single
    row-change back to a one-row bean JSON via ``to_json``. The hot apply
    path never serializes — it stays columnar (SURVEY.md §2 S7 note)."""
    payload = F.when(
        op == "INSERT",
        F.to_json(F.struct(schema_name.alias("Schema"), table_name.alias("Table"),
                           op.alias("Operation"), F.array(after).alias("Inserted"))),
    ).when(
        op == "DELETE",
        F.to_json(F.struct(schema_name.alias("Schema"), table_name.alias("Table"),
                           op.alias("Operation"), F.array(before).alias("Deleted"))),
    ).otherwise(
        F.to_json(F.struct(
            schema_name.alias("Schema"), table_name.alias("Table"), op.alias("Operation"),
            F.array(F.struct(before.alias("Before"), after.alias("After"))).alias("Updated"),
        ))
    )
    return payload
