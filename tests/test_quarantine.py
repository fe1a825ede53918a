"""Dead-letter quarantine for undecodable wire messages: the reference
logs-and-skips events it cannot decode; a 10^10-event ingest wants those
envelopes queryable instead. ``decode_stream(quarantine=True)`` flags them
(unparseable payload / unknown op / DML bean without rows) and the wire
shells dead-letter them to a parquet ``quarantine_dir`` per epoch while
the well-formed slice applies exactly-once."""

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.sources.rawjson import (
    decode_stream,
    encode_stream,
)
from th2_listener_mysql_binlog_go_spark.streaming.structured import (
    StreamingWireApplier,
)

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]

WIRE_ROWS_DDL = ("gtid long, log_name string, log_pos long, seq long, "
                 "ts long, payload string")


def _oracle_events(stream_df):
    return [
        {
            "gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
            "before": r["before"].asDict() if r["before"] else None,
            "after": r["after"].asDict() if r["after"] else None,
        }
        for r in stream_df.collect()
    ]


def test_decode_quarantine_flags_and_reasons(spark):
    good = '{"Schema":"repos","Table":"files","Operation":"INSERT","Inserted":[{"repo":"r1","path":"a","commit":"c","lang":"py","content":"x"}]}'
    rows = [
        (1, "bl.1", 10, 0, 0, good),
        (2, "bl.1", 20, 1, 0, "!corrupt" + good),          # unparseable
        (3, "bl.1", 30, 2, 0, '{"Schema":"repos","Table":"files","Operation":"FROB"}'),
        (4, "bl.1", 40, 3, 0, '{"Schema":"repos","Table":"files","Operation":"INSERT"}'),
        (5, "bl.1", 50, 4, 0, '{"Schema":"repos","Table":"files","Operation":"DELETE","Deleted":[]}'),
    ]
    raw = spark.createDataFrame(rows, WIRE_ROWS_DDL)
    out = decode_stream(raw, quarantine=True).collect()
    by_gtid = {r["gtid"]: r for r in out}
    assert len(out) == 5
    assert not by_gtid[1]["_undecodable"] and by_gtid[1]["_reason"] is None
    assert by_gtid[1]["after"]["repo"] == "r1"
    assert by_gtid[2]["_reason"] == "unparseable payload"
    assert by_gtid[3]["_reason"] == "unknown op FROB"
    assert by_gtid[4]["_reason"] == "DML bean without rows"
    assert by_gtid[5]["_reason"] == "DML bean without rows"
    # raw payload retained for forensic replay
    assert by_gtid[2]["_payload"].startswith("!corrupt")
    # the default path drops ONLY the unparseable row (op NULL) — parity
    dropped = decode_stream(raw).collect()
    assert {r["gtid"] for r in dropped} == {1, 3, 4, 5}


def test_wire_stream_quarantine_dir(spark, tmp_path):
    """Corrupt a deterministic subset of published messages; the wire
    shell dead-letters exactly those envelopes and the table converges to
    the oracle of the surviving events."""
    full = synthetic_changestream(spark, 3000, n_repos=30, n_paths=50,
                                  truncate_per_10k=0)
    wire = encode_stream(full).withColumn(
        "payload",
        F.when(F.col("gtid") % 7 == 0,
               F.concat(F.lit("!"), F.col("payload")))
        .otherwise(F.col("payload")))
    src = str(tmp_path / "wire")
    wire.repartition(3).write.json(src)

    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                             ["repo", "path"], num_buckets=8)
    qdir = str(tmp_path / "dlq")
    wa = StreamingWireApplier(spark, table)
    q = wa.start(src, str(tmp_path / "ckpt"), available_now=True,
                 max_files_per_trigger=1, quarantine_dir=qdir)
    q.awaitTermination(300)

    survived = full.filter("gtid % 7 != 0")
    expected = state_fingerprint(replay_oracle(_oracle_events(survived)))
    got = df_fingerprint([r.asDict() for r in table.read().collect()])
    assert got == expected

    dlq = spark.read.parquet(qdir)
    n_bad = full.filter("gtid % 7 = 0").count()
    assert dlq.count() == n_bad
    assert {r["reason"] for r in dlq.select("reason").distinct().collect()} \
        == {"unparseable payload"}
    assert dlq.filter(~F.col("payload").startswith("!")).count() == 0
    # epochs are stamped; every envelope keeps its position metadata
    assert dlq.filter(F.col("gtid").isNull() | F.col("log_pos").isNull()).count() == 0


def _mini_batch(spark, rows):
    ddl = ("gtid long, log_name string, log_pos long, seq long, ts long, "
           "_payload string, _reason string, _undecodable boolean")
    return spark.createDataFrame(rows, ddl)


def test_quarantine_epoch_replay_is_exactly_once(spark, tmp_path):
    """A crash-replayed epoch re-runs the DLQ write under the SAME epoch
    id; the overwrite-per-epoch-dir layout replaces its own envelopes
    instead of appending duplicates, and a clean epoch writes nothing."""
    from th2_listener_mysql_binlog_go_spark.streaming.structured import (
        _quarantine_split,
    )

    batch = _mini_batch(spark, [
        (1, "bl", 10, 0, 0, "ok", None, False),
        (2, "bl", 20, 1, 0, "!bad", "unparseable payload", True),
        (3, "bl", 30, 2, 0, "!bad2", "unparseable payload", True)])
    qdir = str(tmp_path / "dlq")
    good = _quarantine_split(batch.persist(), qdir, 7, "q1")
    assert good.count() == 1
    _quarantine_split(batch, qdir, 7, "q1")  # crash-replay, same epoch
    dlq = spark.read.parquet(qdir)
    assert dlq.count() == 2                  # replaced, not appended
    assert {r["epoch"] for r in dlq.select("epoch").collect()} == {7}

    # a clean epoch leaves no dir litter
    clean = _mini_batch(spark, [(9, "bl", 90, 0, 0, "ok", None, False)])
    _quarantine_split(clean.persist(), qdir, 8, "q1")
    import os
    assert not os.path.exists(os.path.join(qdir, "ckpt=q1", "epoch=8"))


def test_quarantine_namespaced_per_stream(spark, tmp_path):
    """Two streams sharing one quarantine_dir (or one pipeline restarted
    on a FRESH checkpoint, which restarts epoch ids at 0) must not
    clobber each other's untriaged envelopes: the overwrite is scoped to
    ``ckpt=<query-id>``. A pre-namespace flat layout in the same dir is
    refused instead of corrupting partition discovery."""
    import os

    import pytest

    from th2_listener_mysql_binlog_go_spark.streaming.structured import (
        _quarantine_namespace,
        _quarantine_split,
    )

    qdir = str(tmp_path / "dlq")
    b1 = _mini_batch(spark, [(2, "bl", 20, 1, 0, "!a", "unparseable payload", True)])
    b2 = _mini_batch(spark, [(5, "bl", 50, 2, 0, "!b", "unparseable payload", True)])
    _quarantine_split(b1.persist(), qdir, 0, "streamA")
    _quarantine_split(b2.persist(), qdir, 0, "streamB")  # same epoch id!
    dlq = spark.read.parquet(qdir)
    assert dlq.count() == 2                  # both survive
    assert {r["ckpt"] for r in dlq.select("ckpt").collect()} \
        == {"streamA", "streamB"}

    # legacy flat parquet directly under the dir -> refuse, don't destroy
    legacy = str(tmp_path / "dlq_legacy")
    b1.filter("_undecodable").select("gtid").write.parquet(legacy)
    with pytest.raises(ValueError, match="pre-namespace"):
        _quarantine_split(b1, legacy, 0, "streamA")

    # the namespace is the checkpoint's persisted query id (stable across
    # restarts), falling back to a checkpoint-path hash pre-start
    ck = tmp_path / "ckpt"
    ck.mkdir()
    fallback = _quarantine_namespace(str(ck))
    assert fallback == _quarantine_namespace(str(ck))
    (ck / "metadata").write_text('{"id": "11111111-2222-3333"}')
    assert _quarantine_namespace(str(ck)) == "11111111-2222-3333"
    other = tmp_path / "ckpt2"
    other.mkdir()
    assert _quarantine_namespace(str(other)) != fallback
