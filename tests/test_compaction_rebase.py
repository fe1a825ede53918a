"""Compaction rebase-on-conflict: at scale a compaction runs long beside
live ingest; losing the HEAD CAS to a merge must splice the folded output
onto the new head (consumed files out, folded files in, appended deltas
kept) instead of discarding hours of work. A conflicting REWRITE
(concurrent compaction / rebucket / new TRUNCATE) fails the splice gate
and re-raises for a full replan."""

import pytest

from th2_listener_mysql_binlog_go_spark.plans.lake import (
    ConcurrentCommitError,
    LakeTable,
)

SCHEMA = [("repo", "string"), ("path", "string"), ("size", "int")]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, size int, _op string, _gtid long")


def _inject_before_commit(t, fn):
    """Run ``fn`` once, right before t's next snapshot commit attempt —
    the in-process stand-in for a concurrent writer winning the race."""
    orig = t._write_snapshot
    state = {"fired": False}

    def wrapped(snap_obj):
        if not state["fired"]:
            state["fired"] = True
            fn()
        return orig(snap_obj)

    t._write_snapshot = wrapped
    return state


def test_rebase_splices_over_concurrent_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", "a", 1, "INSERT", 1),
                        ("r", "b", 2, "INSERT", 2),
                        ("r", "a", 3, "UPDATE", 3)]),
            batch_id=1, mode="mor")
    v0 = t.snapshot.version

    def concurrent_merge():
        t2 = LakeTable.load(spark, root)
        t2.merge(_mk(spark, [("r", "c", 9, "INSERT", 10)]),
                 batch_id=2, mode="mor", auto_compact_deltas=None)

    state = _inject_before_commit(t, concurrent_merge)
    assert t.compact(keep_tombstones=True) > 0
    assert state["fired"]

    # spliced: one version for the merge, one for the rebased compaction
    assert t.snapshot.version == v0 + 2
    got = {r["path"]: r["size"] for r in t.read().collect()}
    assert got == {"a": 3, "b": 2, "c": 9}
    # the concurrent batch's delta file survived the splice un-folded
    kinds = {fi.get("kind", "base") for fi in t.snapshot.files}
    assert kinds == {"base", "delta"}
    # and the fold's watermark bookkeeping is the HEAD's (newest)
    assert t.watermark_gtid == 10


def test_rebase_composes_with_tombstones_under_interleave(spark, tmp_path):
    """The race that motivates keep_tombstones: the concurrent merge
    carries an OLDER insert for a key the fold is deleting. The spliced
    snapshot must keep the key dead — the re-emitted tombstone outranks
    the late insert."""
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", "k", 1, "INSERT", 100),
                        ("r", "k", None, "DELETE", 200)]),
            batch_id=1, mode="mor")

    def late_older_insert():
        t2 = LakeTable.load(spark, root)
        t2.merge(_mk(spark, [("r", "k", 5, "INSERT", 150)]),
                 batch_id=2, mode="mor", auto_compact_deltas=None)

    _inject_before_commit(t, late_older_insert)
    t.compact(keep_tombstones=True)
    assert t.read().filter("path = 'k'").count() == 0


def test_rebase_gate_rejects_concurrent_rewrite(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", "a", 1, "INSERT", 1),
                        ("r", "b", 2, "INSERT", 2)]),
            batch_id=1, mode="mor")

    def concurrent_compact():
        LakeTable.load(spark, root).compact()

    _inject_before_commit(t, concurrent_compact)
    with pytest.raises(ConcurrentCommitError, match="re-run compact"):
        t.compact()
    # the table is untouched by the loser and fully readable
    t3 = LakeTable.load(spark, root)
    assert {r["path"] for r in t3.read().collect()} == {"a", "b"}
    # a replan against the fresh head is a clean no-op (already compacted)
    assert t3.compact() == 0
