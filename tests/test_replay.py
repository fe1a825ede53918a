"""End-to-end replay: synthetic change stream -> engine -> sha256-equal to
the independent pandas oracle; resume-mid-stream; lineage invariants."""

import pyspark.sql.functions as F
import pytest

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
N_EVENTS = 4000


def _stream(spark, **kw):
    kw.setdefault("truncate_per_10k", 25)  # ~10 truncates in 4000 events
    return synthetic_changestream(spark, N_EVENTS, n_repos=50, n_paths=80, **kw)


def _oracle_events(stream_df):
    evs = []
    for r in stream_df.collect():
        evs.append({
            "gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
            "before": r["before"].asDict() if r["before"] else None,
            "after": r["after"].asDict() if r["after"] else None,
        })
    return evs


def _final_fingerprint(table):
    return df_fingerprint([r.asDict() for r in table.read().collect()])


def test_full_replay_matches_oracle(spark, tmp_path):
    stream = _stream(spark)
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=8)
    runner = ReplayRunner(spark, table, batch_span=1000, lineage_dir=str(tmp_path / "lin"))
    total = runner.run(stream)
    assert total["batches"] == 4
    expected = state_fingerprint(replay_oracle(_oracle_events(stream)))
    assert _final_fingerprint(table) == expected
    # lineage: batch-level rows contiguous, non-overlapping gtid ranges
    lin = runner.lineage.read(spark).filter(F.col("partition_id") == -1).orderBy("batch_id").collect()
    assert [r["batch_id"] for r in lin] == [0, 1, 2, 3]
    for a, b in zip(lin, lin[1:]):
        assert b["gtid_min"] == a["gtid_max"] + 1
    # per-partition lineage rows exist and sum to sane values
    pl = runner.lineage.read(spark).filter(F.col("partition_id") >= 0).collect()
    assert len(pl) > 0


def test_resume_mid_stream_no_dups_no_gaps(spark, tmp_path):
    stream = _stream(spark)
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, table, batch_span=1000).run(stream, max_batches=2)
    assert table.watermark_gtid < N_EVENTS - 1

    # "restart": reload table from disk, new runner, continue from watermark
    table2 = LakeTable.load(spark, table.root)
    total = ReplayRunner(spark, table2, batch_span=1000).run(stream)
    assert total["batches"] == 2
    expected = state_fingerprint(replay_oracle(_oracle_events(stream)))
    assert _final_fingerprint(table2) == expected

    # replaying the whole stream again is a complete no-op
    total = ReplayRunner(spark, LakeTable.load(spark, table.root), batch_span=1000).run(stream)
    assert total["events"] == 0
    assert _final_fingerprint(LakeTable.load(spark, table.root)) == expected


def test_replay_without_truncate_matches_oracle(spark, tmp_path):
    stream = _stream(spark, with_truncate=False)
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, table, batch_span=2000).run(stream)
    expected = state_fingerprint(replay_oracle(_oracle_events(stream)))
    assert _final_fingerprint(table) == expected


def test_unobserved_table_filtered(spark, tmp_path):
    stream = _stream(spark)
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=8)
    cfg = ApplyConfig(observed={"repos": ["files", "shadow_table"]})
    ReplayRunner(spark, table, batch_span=4000, config=cfg).run(stream)
    # observing shadow_table too must CHANGE the outcome vs default config
    evs = _oracle_events(stream)
    both = state_fingerprint(replay_oracle(evs, observed_tables={"files", "shadow_table"}))
    assert _final_fingerprint(table) == both


def test_resume_refuses_changed_batch_span(spark, tmp_path):
    """Sub-batch ids are gtid//span-derived; resuming under a DIFFERENT
    span either regresses every id below the exactly-once guard (larger
    span: the run silently no-ops with events pending) or re-enters
    applied gtids without the within-batch filter (smaller span). The
    runner must refuse instead."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    full = synthetic_changestream(spark, 1200, n_repos=10, n_paths=20,
                                  truncate_per_10k=0)
    ReplayRunner(spark, t, batch_span=300).run(full.filter("gtid < 700"))
    with pytest.raises(ValueError, match="batch_span=500 does not match"):
        ReplayRunner(spark, t, batch_span=500).run(full)
    # the original span resumes to completion
    r = ReplayRunner(spark, t, batch_span=300).run(full)
    assert r["watermark_gtid"] == 1199 and r["events"] > 0


def test_resume_same_span_survives_empty_batch_history(spark, tmp_path):
    """An EMPTY batch commits last_batch_id without advancing the
    watermark (whole-batch gtid gap — a supported non-dense shape), so no
    (watermark, last_batch_id) arithmetic identifies the span; the
    recorded-property guard must accept the same-span resume this shape
    used to false-refuse (review repro) and still refuse a changed one."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    full = synthetic_changestream(spark, 1200, n_repos=10, n_paths=20,
                                  truncate_per_10k=0)
    gappy = full.filter("gtid < 300 or gtid >= 600")  # batch 1 is EMPTY
    ReplayRunner(spark, t, batch_span=300).run(gappy, max_batches=2)
    assert t.watermark_gtid == 299  # empty batch advanced ids, not wm

    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    # a changed span refuses while work is pending (a fully-caught-up
    # run clamps before the guard — a harmless no-op either way)
    with pytest.raises(ValueError, match="recorded replay_batch_span=300"):
        ReplayRunner(spark, t2, batch_span=400).run(gappy)
    r = ReplayRunner(spark, t2, batch_span=300).run(gappy)  # same span: OK
    assert r["watermark_gtid"] == 1199 and r["events"] > 0


def test_span_recorded_before_mid_batch_ddl_crash(spark, tmp_path):
    """The span must be durable the moment ANY of a batch's data is: a
    crash between the segments of a fresh table's first DDL-segmented
    batch leaves applied sub-batches behind, and a changed-span resume
    must refuse even though no FINAL segment ever committed (the span
    rides every segment commit, not just final_extra_props)."""
    from th2_listener_mysql_binlog_go_spark.sources.changestream import CHANGE_SCHEMA

    def ev(gtid, op, repo=None, path=None, content=None, ddl=None):
        row = (repo, path, "c" * 40, "py", content) if repo else None
        return (gtid, "binlog.000001", gtid * 256, gtid // 3, gtid, "repos",
                "files", op,
                row if op in ("UPDATE", "DELETE") else None,
                row if op in ("INSERT", "UPDATE") else None, ddl)

    stream = spark.createDataFrame(
        [ev(1, "INSERT", "r1", "a.py", "v1"),
         ev(2, "INSERT", "r2", "b.py", "v2"),
         ev(3, "ALTER_TABLE", ddl="ALTER TABLE repos.files ADD COLUMN stars INT"),
         ev(4, "INSERT", "r3", "c.py", "v3")],
        CHANGE_SCHEMA,
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    runner = ReplayRunner(spark, t, batch_span=100)

    def boom(_d):
        raise RuntimeError("crash between segments")

    runner.applier._apply_ddl = boom  # segment 0 committed, DDL "crashes"
    with pytest.raises(RuntimeError, match="crash between segments"):
        runner.run(stream)
    assert t.last_batch_id >= 0  # segment 0's merge IS durable

    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="recorded replay_batch_span=100"):
        ReplayRunner(spark, t2, batch_span=50).run(stream)
    # the original span resumes through the DDL to completion
    r = ReplayRunner(spark, t2, batch_span=100).run(stream)
    assert r["watermark_gtid"] == 4 and r["ddl_applied"] == 1
    rows = {x["repo"]: x for x in t2.read().collect()}
    assert set(rows) == {"r1", "r2", "r3"} and rows["r3"]["stars"] is None
