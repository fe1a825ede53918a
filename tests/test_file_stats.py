"""Commit-level gtid bounds in snapshot metadata (manifest column stats):
stamped from the write job's Observation (zero extra IO), used at plan
time to drop files whose whole gtid range died under a TRUNCATE marker —
the scan must not even open them."""

import json
import os

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _mk(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                            ["repo", "path"], num_buckets=4)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, _op string, _gtid long")


def _commit_dirs(files):
    return {fi["path"].split("/")[1] for fi in files}


def test_gtid_bounds_stamped_and_truncate_prunes_plan(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r2", "b.py", "c2", "go", "v2", "INSERT", 2),
        ("r3", "c.py", "c3", "rs", "v3", "INSERT", 3),
    ]), batch_id=1, mode="mor")
    dead_dirs = _commit_dirs(t.snapshot.files)
    t.merge(_batch(spark, [
        ("r4", "d.py", "c4", "py", "v4", "INSERT", 4),
        ("r1", "a.py", "c5", "py", "v5", "UPDATE", 5),
    ]), batch_id=2, mode="mor")

    # every delta file carries its commit's observed bounds
    by_dir: dict = {}
    for fi in t.snapshot.files:
        assert fi["gtid_lo"] <= fi["gtid_hi"]
        by_dir.setdefault(fi["path"].split("/")[1], set()).add(
            (fi["gtid_lo"], fi["gtid_hi"]))
    assert sorted(b for s in by_dir.values() for b in s) == [(1, 3), (4, 5)]

    # TRUNCATE at gtid 3: batch 1's files are entirely dead -> planned out
    t.merge(_batch(spark, [
        ("r5", "e.py", "c6", "py", "v6", "INSERT", 7),
    ]), batch_id=3, mode="mor", extra_properties={"truncate_gtid": "3"})
    df = t.read()
    scanned = "\n".join(df.inputFiles())
    for d in dead_dirs:
        assert d not in scanned, f"dead commit {d} still scanned"
    assert {(r["repo"], r["path"]) for r in df.collect()} == {
        ("r4", "d.py"), ("r1", "a.py"), ("r5", "e.py")}

    # compaction: dead inputs planned out, outputs stamped past the marker
    t.compact()
    for fi in t.snapshot.files:
        assert fi["gtid_lo"] >= 4 and fi["gtid_hi"] == 7
    assert {(r["repo"], r["path"]) for r in t.read().collect()} == {
        ("r4", "d.py"), ("r1", "a.py"), ("r5", "e.py")}


def test_cow_bounds_cover_kept_rows(spark, tmp_path):
    """CoW rewrites carry forward rows from older batches: the stamped
    bounds must span the KEPT rows, not just the batch's changes."""
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r2", "b.py", "c2", "go", "v2", "INSERT", 2),
    ]), batch_id=1, mode="cow")
    t.merge(_batch(spark, [
        ("r1", "a.py", "c3", "py", "v1b", "UPDATE", 3),
    ]), batch_id=2, mode="cow")
    for fi in t.snapshot.files:
        assert fi["gtid_lo"] >= 1 and fi["gtid_hi"] <= 3
    # r2's kept row (gtid 2) lives in the rewritten bucket: a lo of 3
    # (the change-only bound) would wrongly mark it dead under trunc=2
    lo = min(fi["gtid_lo"] for fi in t.snapshot.files)
    assert lo <= 2


def test_unstamped_files_are_never_pruned(spark, tmp_path):
    """Tables written before stats existed must read identically: strip
    the stamps from the head snapshot, reload, and the truncate falls
    back to the row-level filter."""
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
    ]), batch_id=1, mode="mor")
    t.merge(_batch(spark, [
        ("r2", "b.py", "c2", "go", "v2", "INSERT", 4),
    ]), batch_id=2, mode="mor", extra_properties={"truncate_gtid": "2"})
    head = os.path.join(t.root, "_meta",
                        f"v{t.snapshot.version:012d}.json")
    with open(head) as f:
        snap = json.load(f)
    for fi in snap["files"]:
        fi.pop("gtid_lo", None)
        fi.pop("gtid_hi", None)
    with open(head, "w") as f:
        json.dump(snap, f)
    t2 = LakeTable.load(spark, t.root)
    assert [tuple(r) for r in t2.read().select("repo", "path").collect()] \
        == [("r2", "b.py")]
