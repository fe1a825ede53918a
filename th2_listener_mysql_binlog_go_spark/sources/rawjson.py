"""Raw-JSON bean payload stream: the wire format the reference actually
publishes (serialized bean JSON per README.md:109-240) as a source.

``encode_stream`` turns a CHANGE_SCHEMA stream into (position metadata +
payload JSON) rows — what the reference's MQ consumer receives, with the
four position properties name/pos/seq/timestamp
(/root/reference/component/listener/listener.go:325-332) carried alongside.
``decode_stream`` inverts it with the vectorized bean decoder, yielding a
CHANGE_SCHEMA stream the apply path consumes. Both directions are pure
Catalyst (to_json / from_json) — FIXTURES.md §2's "raw-JSON variant"."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.decode import decode_bean_json, encode_bean_json

_ROW_DDL = "repo string, path string, commit string, lang string, content string"


def encode_stream(changes: DataFrame) -> DataFrame:
    """CHANGE_SCHEMA -> (gtid, log_name, log_pos, seq, ts, payload)."""
    ddl_ops = ("TRUNCATE", "CREATE_TABLE", "DROP_TABLE", "ALTER_TABLE", "QUERY")
    payload = F.when(
        F.col("op").isin(*ddl_ops),
        F.to_json(F.struct(
            F.col("schema_name").alias("Schema"),
            F.col("table_name").alias("Table"),
            F.col("op").alias("Operation"),
            F.col("ddl").alias("Query"),
        )),
    ).otherwise(
        encode_bean_json(
            F.col("schema_name"), F.col("table_name"), F.col("op"),
            F.col("before"), F.col("after"),
        )
    )
    return changes.select("gtid", "log_name", "log_pos", "seq", "ts", payload.alias("payload"))


def decode_stream(raw: DataFrame, row_ddl: str = _ROW_DDL) -> DataFrame:
    """(position cols + payload) -> CHANGE_SCHEMA via the vectorized decoder.

    Query beans keep their raw statement in ``ddl``; op='QUERY' rows are
    classified downstream by the applier (S6), pre-classified DDL ops pass
    through. Undecodable payloads (op NULL) are dropped, mirroring the
    reference's skip of events it cannot decode."""
    d = decode_bean_json(raw, "payload", row_ddl)
    return d.filter(F.col("op").isNotNull()).select(
        "gtid", "log_name", "log_pos", "seq", "ts",
        "schema_name", "table_name", "op", "before", "after", "ddl",
    )
