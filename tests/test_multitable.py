"""Multi-table routing + CREATE/DROP TABLE apply (reference observes a map
of schemas->tables, listener.go:236-241; CREATE/DROP forwarded at
query.go:25-26 — here they are *executed* against the LakeCatalog)."""

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.operators.multi import MultiTableApplier
from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog
from th2_listener_mysql_binlog_go_spark.sources.changestream import CHANGE_SCHEMA
from th2_listener_mysql_binlog_go_spark.streaming.runner import CatalogReplayRunner

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _ev(gtid, op, table="files", repo=None, path=None, content=None, ddl=None):
    row = (repo, path, "c" * 40, "py", content) if repo is not None else None
    before = row if op in ("UPDATE", "DELETE") else None
    after = row if op in ("INSERT", "UPDATE") else None
    return (gtid, "binlog.000001", gtid * 256, gtid, 0, "repos", table, op,
            before, after, ddl)


def _batch(spark, events):
    return spark.createDataFrame(events, CHANGE_SCHEMA)


def _state(cat, schema, table):
    t = cat.get(schema, table)
    if t is None:
        return None
    return {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}


def _two_table_cfg():
    return ApplyConfig(observed={"repos": ["files", "files2"]}, num_buckets=4)


def test_routing_two_tables(spark, tmp_path):
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
    cat.create_table("repos", "files2", SCHEMA, ["repo", "path"], num_buckets=4)
    applier = MultiTableApplier(cat, _two_table_cfg())
    m = applier.apply(_batch(spark, [
        _ev(1, "INSERT", "files", "r1", "a.py", "A1"),
        _ev(2, "INSERT", "files2", "r1", "a.py", "B1"),
        _ev(3, "UPDATE", "files", "r1", "a.py", "A2"),
        _ev(4, "INSERT", "unobserved", "r9", "x.py", "nope"),
        _ev(5, "DELETE", "files2", "r1", "a.py"),
        _ev(6, "INSERT", "files2", "r2", "b.py", "B2"),
    ]), batch_id=0)
    assert _state(cat, "repos", "files") == {("r1", "a.py"): "A2"}
    assert _state(cat, "repos", "files2") == {("r2", "b.py"): "B2"}
    assert m["rows_inserted"] + m["rows_updated"] >= 3
    # per-table TRUNCATE only hits its own table
    applier.apply(_batch(spark, [
        _ev(10, "TRUNCATE", "files", ddl="TRUNCATE TABLE repos.files"),
        _ev(11, "INSERT", "files", "r1", "n.py", "NEW"),
    ]), batch_id=1)
    assert _state(cat, "repos", "files") == {("r1", "n.py"): "NEW"}
    assert _state(cat, "repos", "files2") == {("r2", "b.py"): "B2"}


def test_create_table_mid_stream(spark, tmp_path):
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
    applier = MultiTableApplier(cat, _two_table_cfg())
    assert cat.get("repos", "files2") is None
    m = applier.apply(_batch(spark, [
        _ev(1, "INSERT", "files", "r1", "a.py", "A1"),
        _ev(2, "QUERY", "files2", ddl=(
            "CREATE TABLE repos.files2 (repo VARCHAR(100), path VARCHAR(200), "
            "commit CHAR(48), lang VARCHAR(10), content TEXT, "
            "PRIMARY KEY (repo, path)) ENGINE=InnoDB;")),
        _ev(3, "INSERT", "files2", "r5", "z.py", "Z1"),
    ]), batch_id=0)
    assert m["ddl_applied"] >= 1
    t2 = cat.get("repos", "files2")
    assert t2 is not None
    assert t2.snapshot.key_names == ["repo", "path"]
    assert [c.name for c in t2.snapshot.columns] == ["repo", "path", "commit", "lang", "content"]
    assert _state(cat, "repos", "files2") == {("r5", "z.py"): "Z1"}
    assert _state(cat, "repos", "files") == {("r1", "a.py"): "A1"}
    # replaying the same batch is a no-op (idempotent CREATE + batch guard)
    applier.apply(_batch(spark, [
        _ev(1, "INSERT", "files", "r1", "a.py", "A1"),
        _ev(3, "INSERT", "files2", "r5", "z.py", "Z1"),
    ]), batch_id=0)
    assert _state(cat, "repos", "files2") == {("r5", "z.py"): "Z1"}


def test_drop_and_recreate(spark, tmp_path):
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
    applier = MultiTableApplier(cat, ApplyConfig(num_buckets=4))
    applier.apply(_batch(spark, [
        _ev(1, "INSERT", "files", "r1", "a.py", "OLD"),
    ]), batch_id=0)
    # DROP then re-CREATE then INSERT, all in one batch, gtid-ordered
    applier.apply(_batch(spark, [
        _ev(10, "QUERY", "files", ddl="DROP TABLE repos.files"),
        _ev(11, "QUERY", "files", ddl=(
            "CREATE TABLE repos.files (repo TEXT, path TEXT, note TEXT, "
            "PRIMARY KEY (repo, path))")),
        _ev(12, "INSERT", "files", "r2", "b.py", None),
    ]), batch_id=1)
    t = cat.get("repos", "files")
    assert [c.name for c in t.snapshot.columns] == ["repo", "path", "note"]
    rows = t.read().collect()
    assert [(r["repo"], r["path"]) for r in rows] == [("r2", "b.py")]
    # the old incarnation's row is gone
    assert ("r1", "a.py") not in {(r["repo"], r["path"]) for r in rows}


def test_catalog_runner_resume(spark, tmp_path):
    from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream

    stream = synthetic_changestream(spark, 3000, n_repos=30, n_paths=50,
                                    with_truncate=False)
    cfg = ApplyConfig(observed={"repos": ["files", "shadow_table"]}, num_buckets=4)

    def mk(root):
        cat = LakeCatalog.create(spark, root)
        cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
        cat.create_table("repos", "shadow_table", SCHEMA, ["repo", "path"], num_buckets=4)
        return cat

    # reference run: one shot
    cat_full = mk(str(tmp_path / "full"))
    CatalogReplayRunner(spark, cat_full, batch_span=1000, config=cfg).run(stream)

    # resumed run: crash after 1 batch, reload from disk, continue
    cat_a = mk(str(tmp_path / "resumed"))
    CatalogReplayRunner(spark, cat_a, batch_span=1000, config=cfg).run(stream, max_batches=1)
    cat_b = LakeCatalog.load(spark, str(tmp_path / "resumed"))
    # the span is recorded at first run; a resume under a different one
    # refuses (silent no-op / re-append hazard — see ReplayRunner's guard)
    with pytest.raises(ValueError, match="replay_batch_span=1000"):
        CatalogReplayRunner(spark, cat_b, batch_span=600, config=cfg).run(stream)
    total = CatalogReplayRunner(spark, cat_b, batch_span=1000, config=cfg).run(stream)
    assert total["batches"] == 2

    for pair in [("repos", "files"), ("repos", "shadow_table")]:
        assert _state(cat_b, *pair) == _state(cat_full, *pair)
        assert _state(cat_b, *pair)  # non-empty

    # full replay again: clamped no-op
    again = CatalogReplayRunner(spark, LakeCatalog.load(spark, str(tmp_path / "resumed")),
                                batch_span=1000, config=cfg).run(stream)
    assert again.get("clamped") and again["events"] == 0


def test_catalog_runner_lineage_has_table_names(spark, tmp_path):
    from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream

    stream = synthetic_changestream(spark, 1000, n_repos=10, n_paths=20,
                                    with_truncate=False)
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
    cfg = ApplyConfig(num_buckets=4)
    runner = CatalogReplayRunner(spark, cat, batch_span=1000, config=cfg,
                                 lineage_dir=str(tmp_path / "lin"))
    runner.run(stream)
    lin = runner.lineage.read(spark)
    names = {r["table_name"] for r in lin.select("table_name").distinct().collect()}
    assert names == {"repos.files"}
    assert lin.filter(F.col("partition_id") >= 0).count() > 0


def test_pipelined_catalog_runner_matches_sequential(spark, tmp_path):
    """pipeline_depth>1 + parallel pair staging must converge to exactly
    the sequential runner's state: per-table snapshots and catalog props
    commit in batch order even though the delta writes overlap across
    pairs and batches. DDL mid-stream (TRUNCATE of one table) drains the
    pipeline and still applies at its gtid."""
    events = []
    for g in range(200):
        t = "files" if g % 2 == 0 else "files2"
        events.append(_ev(g, "INSERT" if g % 3 else "UPDATE", t,
                          f"r{g % 7}", f"p{g % 13}.py", f"c{g}"))
    events.append(_ev(120, "TRUNCATE", "files2", ddl="TRUNCATE TABLE repos.files2"))
    events.sort(key=lambda e: e[0])

    states = {}
    for mode, depth in (("seq", 1), ("pipe", 3)):
        cat = LakeCatalog.create(spark, str(tmp_path / f"cat_{mode}"))
        for t in ("files", "files2"):
            cat.create_table("repos", t, SCHEMA, ["repo", "path"], num_buckets=4)
        runner = CatalogReplayRunner(
            spark, cat, batch_span=25, config=_two_table_cfg(),
            pipeline_depth=depth)
        m = runner.run(_batch(spark, events))
        assert m["batches"] == 8
        states[mode] = (_state(cat, "repos", "files"),
                        _state(cat, "repos", "files2"),
                        runner.watermark_gtid)
    assert states["seq"] == states["pipe"]
    # the TRUNCATE landed: no files2 row older than gtid 120 survives
    files2 = states["pipe"][1]
    assert all(int(c[1:]) > 120 for c in files2.values())


def test_catalog_concurrent_commit_guard(spark, tmp_path):
    """Registry commits share the table format's optimistic protocol: a
    stale catalog handle's commit fails loudly after another handle moved
    HEAD."""
    from th2_listener_mysql_binlog_go_spark.plans.lake import ConcurrentCommitError

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=2)
    stale = LakeCatalog.load(spark, str(tmp_path / "cat"))
    cat.set_properties({"watermark_gtid": "5"})
    try:
        stale.create_table("repos", "files2", SCHEMA, ["repo", "path"], num_buckets=2)
        raise AssertionError("expected ConcurrentCommitError")
    except ConcurrentCommitError:
        pass
    fresh = LakeCatalog.load(spark, str(tmp_path / "cat"))
    assert fresh.properties["watermark_gtid"] == "5"
    assert fresh.list_tables() == ["repos.files"]
