"""DedupIndexView: the MinHash-LSH index maintained from the changelog —
after any refresh the index must equal a from-scratch ``minhash_index``
over the source's current state, under inserts, text updates, deletes,
NULL text, crash-replay, and with the corpus text never rescanned on the
match path."""

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.functions.dedup import minhash_index
from th2_listener_mysql_binlog_go_spark.plans.dedup_index import DedupIndexView
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("content", "string")]

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where many animals live quietly") * 2


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, _op string, _gtid long")


def _recompute(view, source):
    return (minhash_index(view._doc_df(source.read()),
                          text_col="text", id_col="doc_id",
                          n_hashes=view.n_hashes, bands=view.bands, k=view.k)
            .select("id", F.col("band").cast("int").alias("band"), "bucket"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_index_matches(view, source):
    got = _rows(view.read().select("id", "band", "bucket"))
    want = _rows(_recompute(view, source))
    assert got == want, (got[:4], want[:4])


def test_index_tracks_recompute_through_refresh_cycles(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a.txt", BASE, "INSERT", 1),
        ("r1", "b.txt", BASE + " extra tail words", "INSERT", 2),
        ("r2", "c.txt", "totally unique content about spacecraft telemetry "
                        "and orbital mechanics with no overlap at all", "INSERT", 3),
    ]), batch_id=1, mode="mor")

    view = DedupIndexView.create(
        spark, t, str(tmp_path / "idx"),
        id_expr="concat(repo, '/', path)", text_expr="content",
        n_hashes=16, bands=4, k=5, num_buckets=2)
    _assert_index_matches(view, t)
    assert view.read().count() == 3 * 4  # every doc owns exactly `bands` rows

    # insert + text update + delete + NULL text in one window
    t.merge(_batch(spark, [
        ("r3", "d.txt", BASE.replace("fox", "cat"), "INSERT", 4),
        ("r1", "a.txt", "completely rewritten document text now", "UPDATE", 5),
        ("r2", "c.txt", None, "DELETE", 6),
        ("r3", "e.txt", None, "INSERT", 7),          # NULL text -> '' rows
    ]), batch_id=2, mode="mor")
    m = view.refresh()
    assert m["plan"] == "incremental"                # O(changes), not a diff
    assert m["to_version"] == t.snapshot.version
    _assert_index_matches(view, t)
    ids = {r["id"] for r in view.read().collect()}
    assert "r2/c.txt" not in ids and "r3/e.txt" in ids

    # UPDATE to NULL text must not leave the old band rows stale
    t.merge(_batch(spark, [
        ("r3", "d.txt", None, "UPDATE", 8),
    ]), batch_id=3, mode="mor")
    view.refresh()
    _assert_index_matches(view, t)

    # crash-replay: re-running the refresh is a no-op
    again = view.refresh()
    assert again.get("skipped") is True
    _assert_index_matches(view, t)


def test_match_finds_indexed_neardup_without_touching_corpus(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [
        ("r1", "a.txt", BASE, "INSERT", 1),
        ("r2", "c.txt", "totally unique content about spacecraft telemetry "
                        "and orbital mechanics with no overlap at all", "INSERT", 2),
    ]), batch_id=1, mode="mor")
    view = DedupIndexView.create(
        spark, t, str(tmp_path / "idx"),
        id_expr="concat(repo, '/', path)", text_expr="content",
        n_hashes=16, bands=4, k=5, num_buckets=2)

    new = spark.createDataFrame(
        [("rX", "clone.txt", BASE + " one more tail"),
         ("rX", "fresh.txt", "ein ganz anderes deutsches dokument ohne "
                             "jede gemeinsamkeit mit den anderen texten hier")],
        "repo string, path string, content string")
    out = view.match(new, min_sig_sim=0.4)
    got = {(r["new_id"], r["match_id"]) for r in out.collect()}
    assert ("rX/clone.txt", "r1/a.txt") in got
    assert all(nid != "rX/fresh.txt" for nid, _ in got)
    # the corpus table's data files are never inputs to the match — only
    # the index table's (the new side hides behind its persisted sigs)
    inputs = out.inputFiles()
    assert inputs and all("/idx/" in f for f in inputs), inputs


def test_load_and_guards(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a.txt", BASE, "INSERT", 1)]),
            batch_id=1, mode="mor")
    DedupIndexView.create(
        spark, t, str(tmp_path / "idx"),
        id_expr="concat(repo, '/', path)", text_expr="content",
        num_buckets=2)

    # reload from disk: params come back from table properties
    v2 = DedupIndexView.load(spark, t, str(tmp_path / "idx"))
    assert (v2.n_hashes, v2.bands, v2.k) == (16, 4, 5)
    _assert_index_matches(v2, t)

    # wrong source is rejected up front
    other = LakeTable.create(spark, str(tmp_path / "other"), SCHEMA,
                             ["repo", "path"], num_buckets=2)
    with pytest.raises(ValueError, match="tracks source"):
        DedupIndexView.load(spark, other, str(tmp_path / "idx"))

    # a plain table is not an index
    with pytest.raises(ValueError, match="storage layout"):
        DedupIndexView.load(spark, t, str(tmp_path / "other"))

    # bands must divide n_hashes
    with pytest.raises(ValueError, match="divide"):
        DedupIndexView.create(spark, t, str(tmp_path / "idx2"),
                              id_expr="repo", text_expr="content",
                              n_hashes=16, bands=3)


def test_streaming_applier_maintains_dedup_index(spark, tmp_path):
    """DedupIndexView duck-types the views= interface (table / source /
    refresh), so the streaming shell maintains the dedup index epoch by
    epoch alongside an aggregate view — and the final index equals a
    from-scratch recompute even though file-paced epochs force diff-plan
    refresh windows."""
    from th2_listener_mysql_binlog_go_spark.plans.matview import IncrementalAggView
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        CHANGE_SCHEMA,
        synthetic_changestream,
    )
    from th2_listener_mysql_binlog_go_spark.streaming.structured import StreamingApplier

    full_schema = SCHEMA[:2] + [("commit", "string"), ("lang", "string")] + SCHEMA[2:]
    src = str(tmp_path / "events")
    synthetic_changestream(spark, 1500, n_repos=25, n_paths=40,
                           truncate_per_10k=0).repartition(4).write.parquet(src)
    table = LakeTable.create(spark, str(tmp_path / "t"), full_schema,
                             ["repo", "path"], num_buckets=4)
    idx = DedupIndexView.create(
        spark, table, str(tmp_path / "idx"),
        id_expr="concat(repo, '/', path)", text_expr="content",
        n_hashes=8, bands=2, k=4, num_buckets=2)
    agg = IncrementalAggView.create(
        spark, table, str(tmp_path / "v"), dims=["lang"],
        aggs={"n": ("count",)}, num_buckets=2)
    v0 = idx.table.snapshot.version

    sa = StreamingApplier(spark, table, views=[idx, agg])
    q = sa.start(src, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
                 available_now=True, max_files_per_trigger=2)
    q.awaitTermination(300)

    assert idx.table.snapshot.version - v0 >= 1   # refreshed mid-stream
    assert idx.source_version == table.snapshot.version
    _assert_index_matches(idx, table)


def test_rebuild_after_watermark_expiry(spark, tmp_path):
    """When the source expires the index's watermark version, refresh()
    raises (the changes window is gone); rebuild() recovers with a full
    re-hash in ONE atomic commit — a truncate marker kills every old
    index row in the same snapshot that adds the recomputed ones."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", BASE, "INSERT", 1),
                           ("r2", "b", "some other words entirely", "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = DedupIndexView.create(
        spark, t, str(tmp_path / "idx"),
        id_expr="concat(repo, '/', path)", text_expr="content",
        n_hashes=8, bands=2, k=4, num_buckets=2)
    for i in range(2, 8):   # advance the source well past the watermark
        t.merge(_batch(spark, [
            (f"r{i}", "c", BASE + f" variant {i}", "INSERT", i + 10),
            ("r2", "b", None, "DELETE", 100) if i == 4
            else (f"r{i}", "d", f"doc {i} words", "INSERT", i + 200),
        ]), batch_id=i, mode="mor")
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        view.refresh()
    m = view.rebuild()
    assert m.get("rebuilt") and m["to_version"] == t.snapshot.version
    _assert_index_matches(view, t)
    assert "r2/b" not in {r["id"] for r in view.read().collect()}
    # idempotent: a replayed rebuild is a no-op
    assert view.rebuild().get("skipped")
    # and incremental refresh resumes from the rebuilt watermark
    t.merge(_batch(spark, [("rz", "z", "zig zag words", "INSERT", 300)]),
            batch_id=9, mode="mor")
    view.refresh()
    _assert_index_matches(view, t)
