"""Time travel, snapshot history, and the incremental changelog (CDC-out).

The lake consumed a binlog (listener role); ``LakeTable.changes()`` makes
it a CDC *source* in turn — the Iceberg-changelog / Delta-CDF analogue of
re-publishing the reference's event stream downstream
(listener.go:296-315's producing role, one hop later)."""

import os

import pyspark.sql.functions as F
import pytest

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _mk(spark, tmp_path, buckets=4):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                            ["repo", "path"], num_buckets=buckets)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, _op string, _gtid long",
    )


def _by_key(df):
    return {(r["repo"], r["path"]): r for r in df.collect()}


def _setup_two_batches(spark, tmp_path, buckets=4):
    """Batch 1: k1,k2,k4-ish inserts; batch 2: update k1, delete k2,
    insert k3, insert-then-delete k5 (no-op in the window)."""
    t = _mk(spark, tmp_path, buckets=buckets)
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r1", "b.py", "c2", "py", "v2", "INSERT", 2),
        ("r2", "c.py", "c3", "go", "v3", "INSERT", 3),
    ]), batch_id=1, mode="mor")
    v1 = t.snapshot.version
    t.merge(_changes(spark, [
        ("r1", "a.py", "c4", "py", "v1b", "UPDATE", 4),
        ("r1", "b.py", None, None, None, "DELETE", 5),
        ("r3", "d.py", "c5", "rs", "v5", "INSERT", 6),
        ("r4", "e.py", "c6", "py", "v6", "INSERT", 7),
        ("r4", "e.py", None, None, None, "DELETE", 8),
    ]), batch_id=2, mode="mor")
    return t, v1


def test_time_travel_read_and_history(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    old = _by_key(t.read_at(v1))
    assert set(old) == {("r1", "a.py"), ("r1", "b.py"), ("r2", "c.py")}
    assert old[("r1", "a.py")]["content"] == "v1"
    now = _by_key(t.read())
    assert set(now) == {("r1", "a.py"), ("r2", "c.py"), ("r3", "d.py")}
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(t.snapshot.version + 1))
    assert hist[v1]["watermark_gtid"] == 3
    assert hist[-1]["watermark_gtid"] == 8
    with pytest.raises(ValueError, match="unknown or expired"):
        t.snapshot_at(999)


def test_changes_incremental_classification(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    assert t.changes_plan(v1) == "incremental"
    ch = _by_key(t.changes(v1, mode="incremental"))
    assert {(k, r["_change_type"]) for k, r in ch.items()} == {
        (("r1", "a.py"), "UPDATE"),
        (("r1", "b.py"), "DELETE"),
        (("r3", "d.py"), "INSERT"),
    }
    # after-image for UPDATE/INSERT, before-image for DELETE
    assert ch[("r1", "a.py")]["content"] == "v1b"
    assert ch[("r1", "b.py")]["content"] == "v2"
    assert ch[("r3", "d.py")]["content"] == "v5"
    # insert-then-delete inside the window emits nothing
    assert ("r4", "e.py") not in ch


def test_changes_fast_path_equals_diff(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    cols = ["repo", "path", "commit", "lang", "content", "_change_type"]
    fast = sorted(map(tuple, t.changes(v1, mode="incremental").select(cols).collect()))
    slow = sorted(map(tuple, t.changes(v1, mode="diff").select(cols).collect()))
    assert fast == slow and len(fast) == 3


def test_changes_include_meta_carries_deciding_event(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    ch = _by_key(t.changes(v1, include_meta=True))
    # the DELETE row carries the delete event's gtid (5), not the row's
    assert ch[("r1", "b.py")]["_gtid"] == 5
    assert ch[("r1", "a.py")]["_gtid"] == 4


def test_changes_compaction_falls_back_to_diff(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    t.compact()
    assert t.changes_plan(v1) == "diff"
    with pytest.raises(ValueError, match="unsound"):
        t.changes(v1, mode="incremental")
    ch = _by_key(t.changes(v1))  # auto -> diff, still correct
    assert {(k, r["_change_type"]) for k, r in ch.items()} == {
        (("r1", "a.py"), "UPDATE"),
        (("r1", "b.py"), "DELETE"),
        (("r3", "d.py"), "INSERT"),
    }
    assert ch[("r1", "b.py")]["content"] == "v2"


def test_changes_truncate_marker_falls_back_and_emits_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r1", "b.py", "c2", "py", "v2", "INSERT", 2),
    ]), batch_id=1, mode="mor")
    v1 = t.snapshot.version
    # GTID-marker TRUNCATE then a fresh insert (the engine's marker path)
    t.merge(_changes(spark, [
        ("r9", "z.py", "c9", "py", "v9", "INSERT", 10),
    ]), batch_id=2, mode="mor", extra_properties={"truncate_gtid": "5"})
    assert t.changes_plan(v1) == "diff"
    ch = _by_key(t.changes(v1))
    assert {(k, r["_change_type"]) for k, r in ch.items()} == {
        (("r1", "a.py"), "DELETE"),
        (("r1", "b.py"), "DELETE"),
        (("r9", "z.py"), "INSERT"),
    }


def test_changes_rebucket_falls_back(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    t.rebucket(8)
    assert t.changes_plan(v1) == "diff"
    ch = _by_key(t.changes(v1))
    assert len(ch) == 3


def test_changes_same_version_and_empty_window(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    head = t.snapshot.version
    assert t.changes(head, head).count() == 0
    with pytest.raises(ValueError, match="precedes"):
        t.changes(head, v1)


def test_changes_expired_from_version_raises(spark, tmp_path):
    t, v1 = _setup_two_batches(spark, tmp_path)
    for i in range(3, 15):
        t.merge(_changes(spark, [
            ("r1", "a.py", f"c{i}", "py", f"w{i}", "UPDATE", 10 + i),
        ]), batch_id=i, mode="mor")
    t.expire_snapshots(keep_last=3)
    with pytest.raises(ValueError, match="unknown or expired"):
        t.changes(v1)


def test_changes_survives_schema_evolution_in_window(spark, tmp_path):
    """ADD COLUMN inside the window: old rows diff as NULL in the new
    column; the incremental path stays sound (metadata-only commit)."""
    t, _ = _setup_two_batches(spark, tmp_path)
    v_mid = t.snapshot.version
    t.add_column("stars", "int")
    df = _changes(spark, [
        ("r2", "c.py", "c7", "go", "v3b", "UPDATE", 20),
    ]).withColumn("stars", F.lit(7))
    t.merge(df, batch_id=3, mode="mor")
    assert t.changes_plan(v_mid) == "incremental"
    ch = _by_key(t.changes(v_mid))
    assert set(ch) == {("r2", "c.py")}
    assert ch[("r2", "c.py")]["_change_type"] == "UPDATE"
    assert ch[("r2", "c.py")]["stars"] == 7


def test_changes_incremental_prunes_to_touched_buckets(spark, tmp_path):
    """Scale proof: the incremental plan's scan set is exactly the
    window's delta files plus the TOUCHED buckets' old files — untouched
    buckets are never read (file-level pruning, O(changes) not O(table))."""
    t = _mk(spark, tmp_path, buckets=8)
    rows = [(f"r{i}", f"f{i}.py", f"c{i}", "py", f"v{i}", "INSERT", i + 1)
            for i in range(16)]
    t.merge(_changes(spark, rows), batch_id=1, mode="mor")
    v1 = t.snapshot.version
    t.merge(_changes(spark, [
        ("r3", "f3.py", "cx", "py", "v3b", "UPDATE", 100),
    ]), batch_id=2, mode="mor")

    from_paths = {fi["path"] for fi in t.snapshot_at(v1).files}
    added = [fi for fi in t.snapshot.files if fi["path"] not in from_paths]
    touched = {fi["bucket"] for fi in added}
    assert len(touched) < 8  # the window really is narrower than the table
    allowed = {fi["path"] for fi in added} | {
        fi["path"] for fi in t.snapshot_at(v1).files if fi["bucket"] in touched
    }
    read_rel = set()
    for p in t.changes(v1, mode="incremental").inputFiles():
        p = p.replace("file:", "")
        read_rel.add(os.path.relpath(p, t.root))
    assert read_rel and read_rel <= allowed
    untouched = {fi["path"] for fi in t.snapshot_at(v1).files
                 if fi["bucket"] not in touched}
    assert not (read_rel & untouched)


def test_changes_apply_roundtrip_reconverges(spark, tmp_path):
    """CDC-out closes the loop: seeding a SECOND table with the v_mid
    state and merging the changelog (deciding-event gtids as the order)
    reconverges to the first table's head state exactly."""
    t, v1 = _setup_two_batches(spark, tmp_path)
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA,
                          ["repo", "path"], num_buckets=4)
    seed = t.read_at(v1, include_meta=True).withColumn("_op", F.lit("INSERT"))
    t2.merge(seed, batch_id=1, mode="mor")
    ch = t.changes(v1, include_meta=True)
    feed = ch.withColumn(
        "_op",
        F.when(F.col("_change_type") == "DELETE", "DELETE").otherwise("UPDATE"),
    ).drop("_change_type")
    t2.merge(feed, batch_id=2, mode="mor")
    a = sorted(map(tuple, t.read().collect()))
    b = sorted(map(tuple, t2.read().collect()))
    assert a == b and len(a) == 3


def test_snapshot_tags_pin_through_expiry(spark, tmp_path):
    """Iceberg tag refs: a tagged version survives expire_snapshots (and
    so vacuum keeps its files); untagging releases it. Tag names resolve
    anywhere a version number does."""
    t, v1 = _setup_two_batches(spark, tmp_path)
    assert t.tags() == {}
    assert t.tag("training-run", version=v1) == v1
    t.compact()
    # resolve by name: read_at and changes() accept the tag
    assert _by_key(t.read_at("training-run"))[("r1", "a.py")]["content"] == "v1"
    assert {r["_change_type"] for r in t.changes("training-run").collect()} \
        == {"INSERT", "UPDATE", "DELETE"}
    # expiry skips the pinned version but drops its untagged elders
    t.expire_snapshots(keep_last=1)
    left = {h["version"] for h in t.history()}
    assert v1 in left and left == {v1, t.snapshot.version}
    assert t.vacuum(older_than_s=0) >= 0
    assert _by_key(t.read_at(v1))[("r1", "a.py")]["content"] == "v1"
    # moving the tag to head releases v1 on the next expiry
    t.tag("training-run")  # defaults to head
    assert t.tags()["training-run"] == t.snapshot.version
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="unknown or expired"):
        t.read_at(v1)
    assert t.untag("training-run") and not t.untag("training-run")
    with pytest.raises(ValueError, match="unknown tag"):
        t.read_at("training-run")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("42")
    with pytest.raises(ValueError, match="unknown or expired"):
        t.tag("ghost", version=999)


def test_changes_noop_update_is_not_a_change(spark, tmp_path):
    """A key rewritten to identical values in the window is not a NET
    change: the incremental plan must agree with the diff plan (and the
    full-outer-join oracle), which filter same-value rows out."""
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r1", "b.py", "c2", "py", "v2", "INSERT", 2),
    ]), batch_id=1, mode="mor")
    v1 = t.snapshot.version
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "UPDATE", 3),   # no-op rewrite
        ("r1", "b.py", "c2", "py", "v2b", "UPDATE", 4),  # real update
    ]), batch_id=2, mode="mor")
    assert t.changes_plan(v1) == "incremental"
    inc = _by_key(t.changes(v1, mode="incremental"))
    dif = _by_key(t.changes(v1, mode="diff"))
    for ch in (inc, dif):
        assert set(ch) == {("r1", "b.py")}
        assert ch[("r1", "b.py")]["_change_type"] == "UPDATE"
        assert ch[("r1", "b.py")]["content"] == "v2b"


def test_time_travel_survives_vacuum_until_expiry(spark, tmp_path):
    """vacuum() keeps every file any RETAINED snapshot pins, so time
    travel works across compaction + vacuum; expire_snapshots is what
    releases the pins (and then the files really go)."""
    t, v1 = _setup_two_batches(spark, tmp_path)
    t.compact()  # head no longer references the delta files v1 pins
    assert t.vacuum(older_than_s=0) == 0  # nothing unreferenced yet
    old = _by_key(t.read_at(v1))
    assert old[("r1", "a.py")]["content"] == "v1"
    t.expire_snapshots(keep_last=1)
    assert t.vacuum(older_than_s=0) > 0  # v1's exclusive files released
    with pytest.raises(ValueError, match="unknown or expired"):
        t.read_at(v1)
    # head still intact after the sweep
    assert _by_key(t.read())[("r1", "a.py")]["content"] == "v1b"
