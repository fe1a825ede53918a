"""Pipelined replay: delta WRITES of consecutive no-DDL batches overlap
(independent Spark jobs), snapshot commits stay batch-ordered. Final state,
lineage, resume, and exactly-once must be indistinguishable from the
sequential path; DDL-bearing batches drain the pipeline (barrier)."""

import pyspark.sql.functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
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


def _fp(spark, root):
    return df_fingerprint([r.asDict() for r in LakeTable.load(spark, root).read().collect()])


def test_pipelined_equals_sequential_with_ddl_barriers(spark, tmp_path):
    # truncates land in some batches -> those batches run sequentially
    # (barrier); the rest pipeline. Outcome must equal depth=1 exactly.
    stream = synthetic_changestream(spark, 6000, n_repos=40, n_paths=60,
                                    truncate_per_10k=10)
    t_seq = LakeTable.create(spark, str(tmp_path / "seq"), SCHEMA, ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, t_seq, batch_span=1000, pipeline_depth=1).run(stream)
    t_pipe = LakeTable.create(spark, str(tmp_path / "pipe"), SCHEMA, ["repo", "path"], num_buckets=8)
    r = ReplayRunner(spark, t_pipe, batch_span=1000, pipeline_depth=3,
                     lineage_dir=str(tmp_path / "lin")).run(stream)
    assert r["batches"] == 6
    expected = state_fingerprint(replay_oracle(_oracle_events(stream)))
    assert _fp(spark, t_seq.root) == expected
    assert _fp(spark, t_pipe.root) == expected
    # commits were ordered: watermark/batch properties converged identically
    assert t_pipe.watermark_gtid == t_seq.watermark_gtid
    assert int(t_pipe.snapshot.properties["last_complete_batch"]) == 4


def test_pipelined_resume_and_replay_noop(spark, tmp_path):
    stream = synthetic_changestream(spark, 4000, n_repos=30, n_paths=50,
                                    with_truncate=False)
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, t, batch_span=1000, pipeline_depth=3).run(stream, max_batches=2)
    # resume from disk, still pipelined
    total = ReplayRunner(spark, LakeTable.load(spark, root), batch_span=1000,
                         pipeline_depth=3).run(stream)
    assert total["batches"] == 2
    expected = state_fingerprint(replay_oracle(_oracle_events(stream)))
    assert _fp(spark, root) == expected
    # full replay again: no-op
    again = ReplayRunner(spark, LakeTable.load(spark, root), batch_span=1000,
                         pipeline_depth=3).run(stream)
    assert again["events"] == 0
    assert _fp(spark, root) == expected


def test_staged_but_uncommitted_files_are_unreachable(spark, tmp_path):
    """Crash between stage and commit: the staged delta files exist on disk
    but no snapshot references them — readers are unaffected and a
    re-applied batch converges (orphans stay orphaned)."""
    stream = synthetic_changestream(spark, 1000, n_repos=10, n_paths=20,
                                    with_truncate=False)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=4)
    from th2_listener_mysql_binlog_go_spark.operators.apply import BatchApplier

    ap = BatchApplier(t, ApplyConfig())
    batch = stream.filter(F.col("gtid") < 500)
    staged = ap.stage_batch(batch)  # "crash" here: never committed
    assert len(staged["written"]) > 0
    assert t.read().count() == 0  # unreachable
    v_before = t.snapshot.version
    # normal apply of the same batch later converges
    ap.apply(batch, batch_id=0)
    assert t.snapshot.version > v_before
    expected = state_fingerprint(replay_oracle(
        _oracle_events(batch), observed_tables={"files"}))
    assert _fp(spark, t.root) == expected
    # committing the orphaned stage afterwards is a guarded no-op
    m = t.commit_staged(staged, batch_id=0)
    assert m["skipped"]
