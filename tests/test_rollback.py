"""Rollback/restore: the table as of an earlier snapshot becomes a NEW
commit — undo a bad batch / correction / ALTER, then replay forward.
History is never rewritten; replay bookkeeping restores with the files so
resume re-applies the undone window exactly-once."""

import pytest

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    CHANGE_SCHEMA,
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint as _df_fp

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _mk(spark, tmp_path, name="t", buckets=4):
    return LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                            ["repo", "path"], num_buckets=buckets)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, _op string, _gtid long",
    )


def _by_key(df):
    return {(r["repo"], r["path"]): r for r in df.collect()}


def _fp(df):
    return _df_fp([r.asDict() for r in df.collect()])


def _two_batches(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r1", "b.py", "c2", "py", "v2", "INSERT", 2),
    ]), batch_id=1, mode="mor")
    v1 = t.snapshot.version
    t.merge(_changes(spark, [
        ("r1", "a.py", "c3", "py", "v1b", "UPDATE", 3),
        ("r1", "b.py", None, None, None, "DELETE", 4),
        ("r2", "c.py", "c4", "go", "v4", "INSERT", 5),
    ]), batch_id=2, mode="mor")
    return t, v1


def test_rollback_restores_state_and_bookkeeping(spark, tmp_path):
    t, v1 = _two_batches(spark, tmp_path)
    v_bad = t.snapshot.version
    wm1 = 2  # batch 1's max gtid

    r = t.rollback(v1)
    assert r["restored"] == v1 and not r["noop"]
    got = _by_key(t.read())
    assert set(got) == {("r1", "a.py"), ("r1", "b.py")}
    assert got[("r1", "a.py")]["content"] == "v1"
    # replay bookkeeping restored with the files
    assert t.watermark_gtid == wm1 and t.last_batch_id == 1
    # history intact: the undone version still time-travels
    bad = _by_key(t.read_at(v_bad))
    assert bad[("r1", "a.py")]["content"] == "v1b"
    # a fresh load sees the restored state
    t2 = LakeTable.load(spark, t.root)
    assert _by_key(t2.read()) == got
    # rollback to the current head is a no-op
    assert t2.rollback(t2.snapshot.version)["noop"]


def test_rollback_then_remerge_converges(spark, tmp_path):
    """The operational story: undo batch 2, re-apply it (same sub-batch
    id — restored last_batch_id aligns the exactly-once guard), end in
    the identical state."""
    t, v1 = _two_batches(spark, tmp_path)
    want = _fp(t.read())
    t.rollback(v1)
    m = t.merge(_changes(spark, [
        ("r1", "a.py", "c3", "py", "v1b", "UPDATE", 3),
        ("r1", "b.py", None, None, None, "DELETE", 4),
        ("r2", "c.py", "c4", "go", "v4", "INSERT", 5),
    ]), batch_id=2, mode="mor")
    assert not m.get("skipped")  # restored last_batch_id=1 re-admits batch 2
    assert _fp(t.read()) == want


def test_rollback_by_tag_and_replay_resume(spark, tmp_path):
    """Tag mid-replay, finish, roll back to the tag, re-run the SAME
    runner config: resume picks up from the restored watermark and the
    final state equals the never-rolled-back run."""
    t = _mk(spark, tmp_path)
    stream = synthetic_changestream(spark, 1500, n_repos=12, n_paths=24,
                                    truncate_per_10k=0)
    ReplayRunner(spark, t, batch_span=500).run(stream, max_batches=1)
    t.tag("pre-incident")
    ReplayRunner(spark, t, batch_span=500).run(stream)
    want = _fp(t.read())

    t.rollback("pre-incident")
    assert t.watermark_gtid == 499
    r = ReplayRunner(spark, t, batch_span=500).run(stream)
    assert r["watermark_gtid"] == 1499 and r["events"] > 0
    assert _fp(t.read()) == want


def test_rollback_undoes_correction(spark, tmp_path):
    t, _ = _two_batches(spark, tmp_path)
    t.tag("pre-fix")
    want = _fp(t.read())
    t.delete_where("repo = 'r2'")
    assert ("r2", "c.py") not in _by_key(t.read())
    t.rollback("pre-fix")
    assert _fp(t.read()) == want


def test_rollback_undoes_schema_ddl_with_fresh_epoch(spark, tmp_path):
    t, v1 = _two_batches(spark, tmp_path)
    epoch_before = t.snapshot.epoch
    t.add_column("stars", "int")
    t.merge(_changes(spark, [
        ("r9", "z.py", "c9", "py", "v9", "INSERT", 9),
    ]).selectExpr("*").withColumn("stars", _lit_int(7)),
        batch_id=3, mode="mor")
    bad_epoch = t.snapshot.epoch
    v_bad = t.snapshot.version

    t.rollback(v1)
    assert [c.name for c in t.snapshot.columns] == [n for n, _ in SCHEMA]
    # fresh epoch, never reusing the undone one; its schema is retained
    assert t.snapshot.epoch > bad_epoch
    assert str(bad_epoch) in t.snapshot.epoch_schemas
    # the undone version (with the column) still time-travels
    assert "stars" in t.read_at(v_bad).columns
    # re-adding the column later cannot collide with the undone epoch
    t.add_column("stars", "int")
    got = _by_key(t.read())
    assert got[("r1", "a.py")]["stars"] is None
    assert t.snapshot.epoch > bad_epoch + 1
    assert epoch_before < bad_epoch  # sanity: the ALTER did bump


def test_changes_across_rollback_falls_back_to_diff(spark, tmp_path):
    t, v1 = _two_batches(spark, tmp_path)
    v_bad = t.snapshot.version
    t.rollback(v1)
    v_rb = t.snapshot.version
    # the rollback window removes files -> incremental gate must refuse
    assert t.changes_plan(v_bad, v_rb) == "diff"
    ops = {(r["repo"], r["path"]): r["_change_type"]
           for r in t.changes(v_bad, v_rb).collect()}
    # compensating ops: the undone UPDATE reverts, INSERT deletes, DELETE re-inserts
    assert ops == {("r1", "a.py"): "UPDATE", ("r1", "b.py"): "INSERT",
                   ("r2", "c.py"): "DELETE"}


def test_rollback_survives_maintenance(spark, tmp_path):
    t, v1 = _two_batches(spark, tmp_path)
    t.rollback(v1)
    want = _fp(t.read())
    t.compact()
    t.expire_snapshots(keep_last=2)
    assert t.vacuum(older_than_s=0) >= 0  # single writer: 0-grace is sanctioned
    assert _fp(LakeTable.load(spark, t.root).read()) == want


def test_rollback_restores_bucket_count(spark, tmp_path):
    t, v1 = _two_batches(spark, tmp_path)
    t.rebucket(8)
    assert t.snapshot.num_buckets == 8
    t.rollback(v1)
    assert t.snapshot.num_buckets == 4
    got = _by_key(t.read())
    assert got[("r1", "a.py")]["content"] == "v1"
    # point read derives the bucket fn from the restored snapshot
    assert t.lookup("r1", "a.py").collect()[0]["content"] == "v1"


def test_rollback_unknown_or_expired_raises(spark, tmp_path):
    t, v1 = _two_batches(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown or expired"):
        t.rollback(99)
    with pytest.raises(ValueError, match="unknown tag"):
        t.rollback("no-such-tag")


def _lit_int(v):
    import pyspark.sql.functions as F
    return F.lit(v).cast("int")
