"""Ordering robustness: non-dense GTIDs (batch planning tolerates sparse
sequence numbers) and the composite (name, pos) total order across binlog
file rotations (/root/reference/README.md:62, listener.go:183-189)."""

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    CHANGE_SCHEMA,
    composite_gtid,
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _oracle_events(stream_df):
    return [{
        "gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
        "before": r["before"].asDict() if r["before"] else None,
        "after": r["after"].asDict() if r["after"] else None,
    } for r in stream_df.collect()]


def test_non_dense_gtids_replay(spark, tmp_path):
    """A sparse GTID sequence (gaps of ~997) plans, replays, and resumes
    exactly like a dense one — floor(gtid/span) batching never assumed
    density."""
    dense = synthetic_changestream(spark, 2000, n_repos=30, n_paths=50,
                                   truncate_per_10k=20)
    sparse = dense.withColumn("gtid", F.col("gtid") * 997 + 13)
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=8)
    runner = ReplayRunner(spark, table, batch_span=500_000)
    runner.run(sparse, max_batches=2)
    ReplayRunner(spark, LakeTable.load(spark, table.root), batch_span=500_000).run(sparse)
    expected = state_fingerprint(replay_oracle(_oracle_events(sparse)))
    got = df_fingerprint([r.asDict() for r in LakeTable.load(spark, table.root).read().collect()])
    assert got == expected
    # replaying again: clamped no-op
    again = ReplayRunner(spark, LakeTable.load(spark, table.root), batch_span=500_000).run(sparse)
    assert again.get("clamped")


def test_composite_name_pos_order_across_rotation(spark, tmp_path):
    """A binlog-native source carrying only (name, pos): ROTATE resets pos
    but bumps the file suffix; composite_gtid keeps the total order, so the
    post-rotation write to a key beats the pre-rotation one even though its
    raw pos is SMALLER."""
    row = lambda c: ("r1", "a.py", "c" * 40, "py", c)  # noqa: E731
    events = [
        # file 000007, pos growing
        (0, "binlog.000007", 90_000, 1, 0, "repos", "files", "INSERT", None, row("pre-rotate"), None),
        # ROTATE -> file 000008, pos resets small; same key updated
        (0, "binlog.000008", 400, 2, 0, "repos", "files", "UPDATE", row("pre-rotate"), row("post-rotate"), None),
        (0, "binlog.000008", 500, 2, 0, "repos", "files", "INSERT", None, ("r2", "b.py", "c" * 40, "py", "x"), None),
    ]
    flat = spark.createDataFrame(events, CHANGE_SCHEMA)
    stream = flat.withColumn("gtid", composite_gtid(F.col("log_name"), F.col("log_pos")))
    # composite is strictly increasing in event order
    gtids = [r["gtid"] for r in stream.orderBy("log_name", "log_pos").collect()]
    assert gtids == sorted(gtids) and len(set(gtids)) == 3
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=4)
    ReplayRunner(spark, table, batch_span=1 << 50).run(stream)
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert state == {("r1", "a.py"): "post-rotate", ("r2", "b.py"): "x"}


def test_seq_packing_wide_events_no_slot_bleed(spark, tmp_path):
    """Round-2 advice: the old _seq packing gave row_idx only 9 bits, so an
    event with >=512 rows bled into log_pos+1's slot and could beat a LATER
    event's write to the same key. With the 2^21 shift, a row at
    (log_pos=10, row_idx=600) must lose to (log_pos=11, row_idx=0)."""
    from th2_listener_mysql_binlog_go_spark.operators.apply import BatchApplier

    row = lambda c: ("r1", "a.py", "c" * 40, "py", c)  # noqa: E731
    events = [
        # same gtid, same key: big-row_idx early event vs next-log_pos event
        (5, "binlog.000001", 10, 0, 0, "repos", "files", "INSERT", None, row("early"), None),
        (5, "binlog.000001", 11, 1, 0, "repos", "files", "UPDATE", row("early"), row("late"), None),
    ]
    flat = spark.createDataFrame(events, CHANGE_SCHEMA).withColumn(
        "row_idx", F.when(F.col("log_pos") == 10, F.lit(600)).otherwise(F.lit(0))
    )
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=2)
    BatchApplier(table).apply(flat, batch_id=0)
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert state == {("r1", "a.py"): "late"}
