"""Tombstone retention at compaction. The default fold drops a key whose
LWW winner is DELETE — sound for gtid-contiguous ingest (ReplayRunner),
UNSOUND under gtid-interleaved ingest (file-paced streaming epochs, the
same shape that gates ``changes()``): a later epoch delivering an OLDER
insert for the folded-away key resurrects it, because the tombstone that
outranked the insert is gone. ``compact(keep_tombstones=True)`` re-emits
each winning DELETE as a flagged per-bucket delta file; the streaming
shells enable it automatically."""

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("size", "int")]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, size int, _op string, _gtid long")


def _interleaved(spark, tmp_path, keep: bool):
    t = LakeTable.create(spark, str(tmp_path / ("k" if keep else "d")),
                         SCHEMA, ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", "k", 1, "INSERT", 100),
                        ("r", "k", None, "DELETE", 200),
                        ("r", "other", 9, "INSERT", 120)]),
            batch_id=1, mode="mor")
    t.compact(keep_tombstones=keep)
    # late file-paced epoch: an OLDER insert for the deleted key
    t.merge(_mk(spark, [("r", "k", 5, "INSERT", 150)]), batch_id=2, mode="mor")
    return t


def test_default_fold_documents_the_interleave_hazard(spark, tmp_path):
    """Pins the DOCUMENTED hazard of the default: without tombstones the
    late older insert resurrects the key (this is why the streaming
    shells keep tombstones; ReplayRunner's gtid-contiguous batches can
    never produce this input)."""
    t = _interleaved(spark, tmp_path, keep=False)
    assert [r["size"] for r in
            t.read().filter("path = 'k'").collect()] == [5]


def test_keep_tombstones_blocks_resurrection(spark, tmp_path):
    t = _interleaved(spark, tmp_path, keep=True)
    assert t.read().filter("path = 'k'").count() == 0  # DELETE@200 wins
    assert [r["size"] for r in t.read().filter("path = 'other'").collect()] == [9]
    # the tombstone file is a flagged delta, bounded to one per bucket
    tombs = [fi for fi in t.snapshot.files if fi.get("tombstones")]
    assert tombs and all(fi["kind"] == "delta" for fi in tombs)
    # the retained DELETE stays visible to the per-key audit view
    hist = t.key_history("r", "k").collect()
    assert [(r["_gtid"], r["_op"]) for r in hist] == [
        (150, "INSERT"), (200, "DELETE")]
    assert not any(r["_is_current"] for r in hist)


def test_tombstone_files_keep_compaction_a_fixed_point(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", "a", 1, "INSERT", 1),
                        ("r", "a", None, "DELETE", 2),
                        ("r", "b", 2, "INSERT", 3)]),
            batch_id=1, mode="mor")
    assert t.compact(keep_tombstones=True) > 0
    v = t.snapshot.version
    # a bucket holding base + its own tombstone delta is NOT dirty
    assert t.compact(keep_tombstones=True) == 0
    assert t.snapshot.version == v
    # a real delta re-dirties the bucket; the old tombstone folds as input
    t.merge(_mk(spark, [("r", "c", 3, "INSERT", 4)]), batch_id=2, mode="mor")
    assert t.compact(keep_tombstones=True) > 0
    assert t.read().filter("path = 'a'").count() == 0
    assert {r["path"] for r in t.read().collect()} == {"b", "c"}
    # still exactly one winning tombstone for the deleted key
    tombs = [fi for fi in t.snapshot.files if fi.get("tombstones")]
    assert len(tombs) <= t.snapshot.num_buckets


def test_truncate_marker_drops_retained_tombstones(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", "a", 1, "INSERT", 1),
                        ("r", "a", None, "DELETE", 2)]),
            batch_id=1, mode="mor")
    t.compact(keep_tombstones=True)
    assert any(fi.get("tombstones") for fi in t.snapshot.files)
    t.merge(_mk(spark, [("r", "z", 7, "INSERT", 10)]), batch_id=2,
            mode="mor", extra_properties={"truncate_gtid": "5"})
    t.compact(keep_tombstones=True)
    # everything at or below the marker died, the tombstone with it
    assert not any(fi.get("tombstones") for fi in t.snapshot.files)
    assert {r["path"] for r in t.read().collect()} == {"z"}


def test_streaming_shells_default_keep_tombstones_on(spark, tmp_path):
    from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog
    from th2_listener_mysql_binlog_go_spark.streaming.structured import (
        StreamingApplier,
        StreamingCatalogApplier,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    sa = StreamingApplier(spark, t)
    assert sa.applier.config.compact_keep_tombstones is True
    # an explicit user choice is respected
    sa2 = StreamingApplier(spark, t,
                           config=ApplyConfig(compact_keep_tombstones=False))
    assert sa2.applier.config.compact_keep_tombstones is False

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    sca = StreamingCatalogApplier(spark, cat)
    assert sca.applier.config.compact_keep_tombstones is True


def test_rebucket_preserves_tombstones(spark, tmp_path):
    """rebucket() persists the LWW-resolved state — without tombstone
    re-emission it would re-open the interleave resurrection hazard
    compact() closes (review finding). Auto-detects from flagged files;
    explicit True covers a never-compacted table."""
    # auto-detect: the table already carries tombstone files
    t = _interleaved_pre(spark, tmp_path / "auto")
    t.compact(keep_tombstones=True)
    t.rebucket(4)
    t.merge(_mk(spark, [("r", "k", 5, "INSERT", 150)]), batch_id=9, mode="mor")
    assert t.read().filter("path = 'k'").count() == 0
    assert any(fi.get("tombstones") for fi in t.snapshot.files)

    # explicit: never compacted, the DELETE only lives in a plain delta
    t2 = _interleaved_pre(spark, tmp_path / "explicit")
    t2.rebucket(4, keep_tombstones=True)
    t2.merge(_mk(spark, [("r", "k", 5, "INSERT", 150)]), batch_id=9, mode="mor")
    assert t2.read().filter("path = 'k'").count() == 0


def _interleaved_pre(spark, root):
    t = LakeTable.create(spark, str(root), SCHEMA, ["repo", "path"],
                         num_buckets=2)
    t.merge(_mk(spark, [("r", "k", 1, "INSERT", 100),
                        ("r", "k", None, "DELETE", 200),
                        ("r", "other", 9, "INSERT", 120)]),
            batch_id=1, mode="mor")
    return t


def test_auto_compact_trigger_ignores_tombstone_files(spark, tmp_path):
    """Tombstone files are compaction's own steady-state output (never
    cleared by design) — counting them toward auto_compact_deltas would
    pin the trigger past the threshold and compact EVERY batch (review
    finding)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_mk(spark, [("r", f"p{i}", i, "INSERT", i) for i in range(1, 5)]
                + [("r", "p1", None, "DELETE", 10),
                   ("r", "p2", None, "DELETE", 11)]),
            batch_id=1, mode="mor")
    t.compact(keep_tombstones=True)
    n_tomb = sum(1 for fi in t.snapshot.files if fi.get("tombstones"))
    assert n_tomb >= 1
    # threshold below the standing tombstone count: one small new delta
    # batch must NOT trigger a compaction
    m = t.merge(_mk(spark, [("r", "z", 1, "INSERT", 20)]), batch_id=2,
                mode="mor", auto_compact_deltas=n_tomb,
                compact_keep_tombstones=True)
    assert "compacted_buckets" not in m
