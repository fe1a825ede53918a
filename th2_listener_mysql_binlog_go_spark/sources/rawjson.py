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


def encode_stream_batched(
    changes: DataFrame,
    max_size: int,
    base_size: int = 96,
    split_mode: str = "greedy",
) -> DataFrame:
    """Size-bounded wire encoding — the full S9→S10 pipeline of the
    reference's ``putToBatch`` (listener.go:265-294): rows of one binlog
    *event* (one RowsEvent → one bean, listener.go:229-244; in the stream,
    the rows sharing ``(gtid, log_pos, schema_name, table_name, op)``)
    combine into one multi-row bean payload; an oversized splittable event
    (INSERT/DELETE) is greedily packed into parts <= ``max_size`` by the
    exact split semantics of ``DataSlice.split`` (bean.go:129-150) via
    :func:`...split.split_plan`, and each part serializes as its own
    message. UPDATE/Query events are never split (update.go:49-55,
    query.go:48-54).

    Event identity is the full ``(gtid, log_pos, schema, table, op)``
    tuple, NOT the GTID: a transaction (one GTID) routinely carries
    several events with different ops/tables, and the reference publishes
    one bean per event — merging them would corrupt the wire stream (an
    INSERT to A and a DELETE to B at one GTID must stay two payloads).
    Within an event, rows keep their source order via the ``seq`` column.

    Output: (gtid, log_pos, part_idx, log_name, seq, ts, payload) — one
    row per published message; the full EVENT identity ``(gtid, log_pos,
    schema, table, op, part_idx)`` identifies it (for a real binlog the
    position alone suffices — one event per position — but a producer
    that multiplexes positions, e.g. the lakefeed's version clock, needs
    the op/table too), ``part_idx`` consumed from the split plan. ``base_size`` must
    upper-bound the envelope header (Record.sizeBytes, bean.go:47-53) so
    the size guarantee holds.

    ``split_mode``: 'greedy' is the reference's exact sequential packing
    (one ``mapInPandas`` kernel — per-row Python, contained to one pass);
    'cumsum' is the pure-Catalyst prefix-sum plan
    (:func:`...split.split_plan_cumsum`) with the same never-oversize
    guarantee but slightly more parts — the choice for streaming-publisher
    hot paths where the Python kernel would run per micro-batch."""
    from ..functions.split import split_plan, split_plan_cumsum

    event_cols = ["gtid", "log_pos", "schema_name", "table_name", "op"]
    ddl_ops = ("TRUNCATE", "CREATE_TABLE", "DROP_TABLE", "ALTER_TABLE", "QUERY")
    dml = changes.filter(~F.col("op").isin(*ddl_ops))
    row_json = (
        F.when(F.col("op") == "INSERT", F.to_json(F.col("after")))
        .when(F.col("op") == "DELETE", F.to_json(F.col("before")))
        .otherwise(F.to_json(F.struct(
            F.col("before").alias("Before"), F.col("after").alias("After"))))
    )
    sized = dml.withColumn("row_json", row_json).withColumn(
        "est_size", F.octet_length(F.col("row_json"))
    )
    splitter = {"greedy": split_plan, "cumsum": split_plan_cumsum}[split_mode]
    planned = splitter(sized, event_col=event_cols, order_col="seq",
                       size_col="est_size", op_col="op",
                       max_size=max_size, base_size=base_size)
    field = (
        F.when(F.col("op") == "INSERT", F.lit("Inserted"))
        .when(F.col("op") == "DELETE", F.lit("Deleted"))
        .otherwise(F.lit("Updated"))
    )
    # group on the full event identity: op/schema/table are grouping keys,
    # so payload headers are homogeneous by construction; rows keep their
    # within-event source order (array_sort on the leading seq field).
    grouped = planned.groupBy(*event_cols, "part_idx").agg(
        F.min("log_name").alias("log_name"),
        F.min("seq").alias("seq"),
        F.min("ts").alias("ts"),
        F.array_sort(F.collect_list(F.struct("seq", "row_json"))).alias("rows"),
    )
    hdr = F.to_json(F.struct(
        F.col("schema_name").alias("Schema"),
        F.col("table_name").alias("Table"),
        F.col("op").alias("Operation"),
    ))
    joined = F.array_join(F.transform(F.col("rows"), lambda x: x["row_json"]), ",")
    payload = F.concat(
        F.substring(hdr, F.lit(1), F.length(hdr) - 1),
        F.lit(',"'), field, F.lit('":['), joined, F.lit("]}"),
    )
    dml_out = grouped.select(
        "gtid", "log_pos", F.col("part_idx").cast("int").alias("part_idx"),
        "log_name", "seq", "ts", payload.alias("payload"),
    )
    ddl_out = changes.filter(F.col("op").isin(*ddl_ops)).select(
        "gtid", "log_pos", F.lit(0).cast("int").alias("part_idx"), "log_name", "seq", "ts",
        F.to_json(F.struct(
            F.col("schema_name").alias("Schema"),
            F.col("table_name").alias("Table"),
            F.col("op").alias("Operation"),
            F.col("ddl").alias("Query"),
        )).alias("payload"),
    )
    return dml_out.unionByName(ddl_out)


#: ops the apply path understands: DML, the pre-classified DDL markers the
#: batched encoder emits, and raw QUERY statements (classified downstream).
_KNOWN_OPS = ("INSERT", "UPDATE", "DELETE", "QUERY", "TRUNCATE",
              "CREATE_TABLE", "DROP_TABLE", "ALTER_TABLE")


def decode_stream(raw: DataFrame, row_ddl: str = _ROW_DDL,
                  quarantine: bool = False) -> DataFrame:
    """(position cols + payload) -> CHANGE_SCHEMA via the vectorized decoder.

    Query beans keep their raw statement in ``ddl``; op='QUERY' rows are
    classified downstream by the applier (S6), pre-classified DDL ops pass
    through. Undecodable payloads (op NULL) are dropped, mirroring the
    reference's skip of events it cannot decode. ``row_idx`` (within-event
    row order of multi-row beans) rides along so the apply path's ``_seq``
    packing keeps the reference's (pos, seq) sub-order.

    ``quarantine=True`` keeps undecodable messages instead of dropping
    them, flagged ``_undecodable`` with a ``_reason`` and the raw
    ``_payload`` retained — the dead-letter path for pipelines that must
    account for every message rather than silently skip (the reference
    logs and skips, listener.go; a 10^10-event ingest wants the skipped
    envelopes queryable). Flagged: unparseable payloads (op NULL), beans
    with an op the apply path doesn't know, and DML beans carrying no
    rows (``posexplode_outer`` keeps the empty/NULL-array row with a NULL
    ``row_idx``). Well-formed rows carry ``_undecodable = false`` and a
    NULL ``_reason``.

    Messages carrying ``part_idx`` (the batched encoder splits oversized
    events into parts, each its own message) fold it into the emitted
    ``log_pos``: every part's payload restarts ``row_idx`` at 0 while all
    parts share the source ``log_pos``, so without the fold two rows in
    different parts of ONE event could collide in ``_seq`` and leave LWW
    between them undefined (round-4 advice #3). The fold is order-exact:
    parts partition the event's seq-sorted rows in order, and
    ``log_pos + part_idx`` stays strictly below the NEXT event's log_pos
    because a split event's byte size (>= 1 byte per part) bounds its part
    count while log_pos advances by the full event size."""
    d = decode_bean_json(raw, "payload", row_ddl)
    log_pos = F.col("log_pos")
    if "part_idx" in raw.columns:
        log_pos = log_pos + F.coalesce(F.col("part_idx").cast("bigint"), F.lit(0))
    cols = ["gtid", "log_name", log_pos.alias("log_pos"), "seq", "ts",
            "schema_name", "table_name", "op", "row_idx", "before", "after",
            "ddl"]
    if not quarantine:
        return d.filter(F.col("op").isNotNull()).select(*cols)
    is_dml = F.col("op").isin("INSERT", "UPDATE", "DELETE")
    reason = (
        F.when(F.col("op").isNull(), F.lit("unparseable payload"))
        .when(~F.col("op").isin(*_KNOWN_OPS),
              F.concat(F.lit("unknown op "), F.col("op")))
        .when(is_dml & F.col("row_idx").isNull(), F.lit("DML bean without rows"))
    )
    return d.select(*cols, F.col("payload").alias("_payload"),
                    reason.alias("_reason"),
                    reason.isNotNull().alias("_undecodable"))
