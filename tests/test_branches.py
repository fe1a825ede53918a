"""WAP branches: stage commits on a branch ref (own snapshot chain under
_meta/branches/<name>/, shared data dir), audit by reading the branch,
publish = fast-forward-only HEAD swap after copying the branch's immutable
version files onto main's chain. Main is never touched until publish."""

import os

import pytest

from th2_listener_mysql_binlog_go_spark.plans.lake import (
    ConcurrentCommitError,
    LakeTable,
)
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint as _df_fp

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _mk(spark, tmp_path, name="t"):
    return LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                            ["repo", "path"], num_buckets=4)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, _op string, _gtid long",
    )


def _fp(df):
    return _df_fp([r.asDict() for r in df.collect()])


def test_branch_isolation_and_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("r1", "a.py", "c1", "py", "v1", "INSERT", 1)]),
            batch_id=1, mode="mor")
    v_main = t.snapshot.version

    b = t.create_branch("audit")
    b.merge(_changes(spark, [
        ("r2", "b.py", "c2", "py", "v2", "INSERT", 2),
        ("r1", "a.py", "c3", "py", "v1b", "UPDATE", 3),
    ]), batch_id=2, mode="mor")

    # staged on the branch, invisible on main — including via a fresh load
    assert t.read().count() == 1
    assert LakeTable.load(spark, t.root).snapshot.version == v_main
    assert b.read().count() == 2
    assert t.branches() == {"audit": {"tip": b.snapshot.version, "fork": v_main}}
    # cross-process handle on the branch
    assert LakeTable.load(spark, t.root, branch="audit").read().count() == 2

    r = t.publish_branch("audit")
    assert not r["noop"] and r["commits"] == 1
    t2 = LakeTable.load(spark, t.root)
    rows = {x["repo"]: x["content"] for x in t2.read().collect()}
    assert rows == {"r1": "v1b", "r2": "v2"}
    assert t2.watermark_gtid == 3  # branch bookkeeping published with it
    assert t2.branches() == {}
    # the published window is real main history: time travel + provenance
    assert [h["version"] for h in t2.history()] == [0, 1, 2]
    assert t2.snapshot.properties["published_from_branch"] == "audit"
    assert t2.read_at(v_main).count() == 1


def test_publish_refuses_when_main_advanced(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("risky")
    b.merge(_changes(spark, [("rb", "b.py", "c", "py", "v", "INSERT", 1)]),
            batch_id=1, mode="mor")
    t.merge(_changes(spark, [("rm", "m.py", "c", "py", "v", "INSERT", 2)]),
            batch_id=2, mode="mor")
    with pytest.raises(ConcurrentCommitError, match="fast-forward"):
        t.publish_branch("risky")
    # the branch survives the refused publish; dropping it is explicit
    assert "risky" in t.branches()
    assert t.drop_branch("risky") and t.branches() == {}
    assert not t.drop_branch("risky")


def test_branch_replay_backfill_equals_direct(spark, tmp_path):
    """The WAP story: main has the first half; the second half backfills
    on a branch via the normal ReplayRunner (bookkeeping lives in branch
    snapshots), is audited, and publishes — final main state hash-equals
    a never-branched replay of the whole stream."""
    stream = synthetic_changestream(spark, 1500, n_repos=12, n_paths=24,
                                    truncate_per_10k=0)
    direct = _mk(spark, tmp_path, "direct")
    ReplayRunner(spark, direct, batch_span=500).run(stream)
    want = _fp(direct.read())

    t = _mk(spark, tmp_path, "wap")
    ReplayRunner(spark, t, batch_span=500).run(stream, max_batches=1)
    b = t.create_branch("backfill")
    ReplayRunner(spark, b, batch_span=500).run(stream)
    assert b.watermark_gtid == 1499
    assert _fp(b.read()) == want          # the audit read
    assert t.read().count() < b.read().count() or t.watermark_gtid == 499
    t.publish_branch("backfill")
    assert t.watermark_gtid == 1499
    assert _fp(LakeTable.load(spark, t.root).read()) == want


def test_branch_compact_and_rollback_stay_on_branch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("r1", "a.py", "c1", "py", "v1", "INSERT", 1)]),
            batch_id=1, mode="mor")
    b = t.create_branch("maint")
    b.merge(_changes(spark, [("r1", "a.py", "c2", "py", "v2", "UPDATE", 2)]),
            batch_id=2, mode="mor")
    v_pre = b.snapshot.version
    b.merge(_changes(spark, [("r1", "a.py", None, None, None, "DELETE", 3)]),
            batch_id=3, mode="mor")
    b.compact()
    assert b.read().count() == 0
    rb = b.rollback(v_pre)  # branch-local undo; pre-fork history readable too
    assert not rb["noop"]
    assert b.read().collect()[0]["content"] == "v2"
    assert b.read_at(1).collect()[0]["content"] == "v1"  # pre-fork, via main
    assert LakeTable.load(spark, t.root).read().collect()[0]["content"] == "v1"


def test_vacuum_keeps_live_branch_files_drops_dropped(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("r1", "a.py", "c1", "py", "v1", "INSERT", 1)]),
            batch_id=1, mode="mor")
    b = t.create_branch("keepme")
    b.merge(_changes(spark, [("rb", "b.py", "cb", "py", "vb", "INSERT", 2)]),
            batch_id=2, mode="mor")
    t.vacuum(older_than_s=0)
    assert LakeTable.load(spark, t.root, branch="keepme") \
        .read().filter("repo='rb'").count() == 1
    t.drop_branch("keepme")
    assert t.vacuum(older_than_s=0) > 0  # the branch's exclusive files go
    assert t.read().count() == 1  # main state untouched


def test_branch_guards_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("b1")
    for call in (lambda: b.tag("x"), lambda: b.untag("x"), b.vacuum,
                 b.expire_snapshots, lambda: b.create_branch("nested"),
                 lambda: b.publish_branch("b1"), lambda: b.drop_branch("b1")):
        with pytest.raises(ValueError, match="main table"):
            call()
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("b1")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("../evil")
    with pytest.raises(ValueError, match="unknown branch"):
        t.branch_table("nope")
    # published/dropped branch name is reusable
    t.drop_branch("b1")
    t.create_branch("b1")


def test_branch_fork_at_older_version_and_expire(spark, tmp_path):
    """A branch forked at an older version stays self-contained (its dir
    carries a fork-snapshot copy) even after main expires that version;
    publish then refuses because main's head moved past the fork."""
    t = _mk(spark, tmp_path)
    for i in range(1, 13):
        t.merge(_changes(spark, [("r1", "a.py", f"c{i}", "py", f"v{i}",
                                  "INSERT" if i == 1 else "UPDATE", i)]),
                batch_id=i, mode="mor")
    b = t.create_branch("old", at=2)
    assert b.read().collect()[0]["content"] == "v2"
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="unknown or expired"):
        t.read_at(2)
    assert LakeTable.load(spark, t.root, branch="old") \
        .read().collect()[0]["content"] == "v2"
    with pytest.raises(ConcurrentCommitError, match="fast-forward"):
        t.publish_branch("old")


def test_branch_time_travel_bounded_at_fork(spark, tmp_path):
    """The main-chain fallback for branch time travel stops AT the fork:
    main's post-fork versions belong to a lineage the branch never
    contained and must read as unknown, not silently served (and a branch
    rollback() onto one would mix lineages)."""
    t = _mk(spark, tmp_path)
    for i in range(1, 9):
        t.merge(_changes(spark, [("r1", "a.py", f"c{i}", "py", f"v{i}",
                                  "INSERT" if i == 1 else "UPDATE", i)]),
                batch_id=i, mode="mor")
    b = t.create_branch("old", at=2)
    assert b.read_at(2).collect()[0]["content"] == "v2"   # fork copy
    assert b.read_at(1).collect()[0]["content"] == "v1"   # pre-fork, via main
    for bad in (5, 8):  # main's divergent versions
        with pytest.raises(ValueError, match="unknown or expired"):
            b.read_at(bad)
        with pytest.raises(ValueError, match="unknown or expired"):
            b.rollback(bad)


def test_branch_rollback_prefork_keeps_fork_marker(spark, tmp_path):
    """rollback() on a branch to a PRE-fork (main-chain) target must
    re-stamp branch_fork_version — the target's main properties lack it,
    and losing it bricks publish_branch / misreports branches()."""
    t = _mk(spark, tmp_path)
    for i in (1, 2, 3):
        t.merge(_changes(spark, [("r1", "a.py", f"c{i}", "py", f"v{i}",
                                  "INSERT" if i == 1 else "UPDATE", i)]),
                batch_id=i, mode="mor")
    b = t.create_branch("fix")  # fork at main head v3
    b.merge(_changes(spark, [("r1", "a.py", "cx", "py", "bad", "UPDATE", 4)]),
            batch_id=4, mode="mor")
    rb = b.rollback(2)  # undo everything staged, back to a pre-fork state
    assert not rb["noop"]
    assert b.read().collect()[0]["content"] == "v2"
    assert t.branches()["fix"]["fork"] == 3
    r = t.publish_branch("fix")  # main head == fork: fast-forward works
    assert not r["noop"]
    assert LakeTable.load(spark, t.root).read().collect()[0]["content"] == "v2"


def test_publish_retry_after_crash_before_cleanup(spark, tmp_path):
    """A publish that swapped main's HEAD but crashed before removing the
    branch ref must be retryable: the retry detects main already carries
    this exact tip (provenance + content) and finishes the cleanup."""
    import shutil

    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("r1", "a.py", "c1", "py", "v1", "INSERT", 1)]),
            batch_id=1, mode="mor")
    b = t.create_branch("bf")
    b.merge(_changes(spark, [("r2", "b.py", "c2", "py", "v2", "INSERT", 2)]),
            batch_id=2, mode="mor")
    bdir = os.path.join(t.root, "_meta", "branches", "bf")
    saved = str(tmp_path / "saved_ref")
    shutil.copytree(bdir, saved)
    t.publish_branch("bf")
    shutil.copytree(saved, bdir)  # resurrect the ref = the crash window
    t2 = LakeTable.load(spark, t.root)
    r = t2.publish_branch("bf")
    assert r["noop"] and r["published"] == "bf" and r["version"] == 2
    assert t2.branches() == {}
    assert {x["repo"] for x in t2.read().collect()} == {"r1", "r2"}
    # but a REAL divergence (same tip version, different content) refuses
    b2 = t2.create_branch("bf", at=1)
    b2.merge(_changes(spark, [("r3", "c.py", "c3", "py", "v3", "INSERT", 3)]),
             batch_id=3, mode="mor")  # tip v2 == main head v2, different state
    with pytest.raises(ConcurrentCommitError, match="fast-forward"):
        t2.publish_branch("bf")


def test_cli_branch_drop_requires_name(spark, tmp_path):
    import argparse

    from th2_listener_mysql_binlog_go_spark.__main__ import cmd_branch

    t = _mk(spark, tmp_path)
    ns = argparse.Namespace(table=t.root, name=None, at=None,
                            drop=True, list=False)
    with pytest.raises(SystemExit, match="--name is required"):
        cmd_branch(ns)


def test_publish_strips_fork_marker_from_all_copied_versions(spark, tmp_path):
    """Intermediate published versions must not carry branch_fork_version
    onto main's chain: a later main rollback() to one would resurrect the
    marker into main's live property chain forever."""
    t = _mk(spark, tmp_path)
    b = t.create_branch("multi")
    for i in (1, 2, 3):
        b.merge(_changes(spark, [("r1", "a.py", f"c{i}", "py", f"v{i}",
                                  "INSERT" if i == 1 else "UPDATE", i)]),
                batch_id=i, mode="mor")
    t.publish_branch("multi")
    t2 = LakeTable.load(spark, t.root)
    for v in (1, 2, 3):
        assert "branch_fork_version" not in t2.snapshot_at(v).properties
    t2.rollback(2)
    assert "branch_fork_version" not in t2.snapshot.properties


def test_publish_empty_branch_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_branch("idle")
    r = t.publish_branch("idle")
    assert r["noop"] and t.branches() == {}
    assert os.path.exists(os.path.join(t.root, "_meta", "HEAD"))
