"""IncrementalAggView: materialized aggregates maintained from the
changelog — every refresh must equal a full recompute, under inserts,
updates (including dim-moving ones), deletes-to-zero, NULL dims,
crash-replay, and time travel over refresh history."""

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.plans.matview import IncrementalAggView

SCHEMA = [("repo", "string"), ("path", "string"), ("lang", "string"),
          ("size", "int")]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, lang string, size int, "
              "_op string, _gtid long")


def _recompute(source):
    return (source.read().groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("size").cast("bigint").alias("total_size"),  # SQL sum: NULL for all-NULL
                 (F.sum("size").cast("double") /
                  F.nullif(F.count("size"), F.lit(0))).alias("mean_size")))


def _rows(df):
    return sorted([tuple(r) for r in df.collect()],
                  key=lambda t: tuple((v is None, v) for v in t))


def _assert_view_matches(view, source):
    got = _rows(view.read())
    want = _rows(_recompute(source))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        if g[3] is None or w[3] is None:
            assert g[3] == w[3], (g, w)
        else:
            assert g[3] == pytest.approx(w[3]), (g, w)


AGGS = {"n_files": ("count",), "total_size": ("sum", "size"),
        "mean_size": ("avg", "size")}


def test_view_tracks_recompute_through_refresh_cycles(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a.py", "py", 10, "INSERT", 1),
        ("r1", "b.py", "py", 20, "INSERT", 2),
        ("r2", "c.go", "go", 30, "INSERT", 3),
        ("r2", "d.rs", "rs", 40, "INSERT", 4),
    ]), batch_id=1, mode="mor")

    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS, num_buckets=2)
    _assert_view_matches(view, t)

    # inserts + update + delete
    t.merge(_batch(spark, [
        ("r3", "e.py", "py", 50, "INSERT", 5),
        ("r1", "a.py", "py", 15, "UPDATE", 6),       # same-dim update
        ("r2", "c.go", None, None, "DELETE", 7),     # go group -> zero
    ]), batch_id=2, mode="mor")
    m = view.refresh()
    assert m["to_version"] == t.snapshot.version
    _assert_view_matches(view, t)
    langs = {r["lang"] for r in view.read().collect()}
    assert "go" not in langs  # emptied group row is DELETED, not zeroed

    # dim-moving update: the row leaves one group and enters another
    t.merge(_batch(spark, [
        ("r2", "d.rs", "zig", 41, "UPDATE", 8),
    ]), batch_id=3, mode="mor")
    view.refresh()
    _assert_view_matches(view, t)
    langs = {r["lang"] for r in view.read().collect()}
    assert "rs" not in langs and "zig" in langs


def test_view_null_dims_and_null_measures(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [
        ("r1", "a", None, 10, "INSERT", 1),   # NULL dim group
        ("r1", "b", None, None, "INSERT", 2),  # NULL measure in NULL group
        ("r1", "c", "py", None, "INSERT", 3),  # all-NULL measure group
    ]), batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS, num_buckets=2)
    _assert_view_matches(view, t)
    # avg of the all-NULL group is NULL (SQL avg), count still 1
    row = {r["lang"]: r for r in view.read().collect()}
    assert row["py"]["mean_size"] is None and row["py"]["n_files"] == 1

    t.merge(_batch(spark, [
        ("r1", "b", None, 7, "UPDATE", 4),    # NULL group gains a value
        ("r1", "a", None, None, "DELETE", 5),
    ]), batch_id=2, mode="mor")
    view.refresh()
    _assert_view_matches(view, t)


def test_view_refresh_is_idempotent_and_crash_replayable(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    t.merge(_batch(spark, [("r1", "b", "py", 20, "INSERT", 2)]),
            batch_id=2, mode="mor")
    m1 = view.refresh()
    assert not m1.get("skipped")
    # replayed refresh (same source version): batch_id gate makes it a no-op
    m2 = view.refresh()
    assert m2.get("skipped")
    _assert_view_matches(view, t)
    # a FRESH handle (crash analogue) resumes from the persisted watermark
    v2 = IncrementalAggView.load(spark, t, str(tmp_path / "v"))
    assert v2.source_version == t.snapshot.version
    assert v2.refresh().get("skipped")
    _assert_view_matches(v2, t)


def test_view_survives_source_compaction_via_diff_fallback(spark, tmp_path):
    """A compaction inside the refresh window makes the incremental
    changes plan unsound; mode='auto' must fall back to the diff plan and
    the view must still match the recompute."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r2", "b", "go", 20, "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    t.merge(_batch(spark, [("r1", "a", "py", 11, "UPDATE", 3),
                           ("r2", "b", None, None, "DELETE", 4)]),
            batch_id=2, mode="mor")
    t.compact()
    assert t.changes_plan(view.source_version) == "diff"
    view.refresh()
    _assert_view_matches(view, t)


def test_view_time_travel_and_minmax_create(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    v_before = view.table.snapshot.version
    t.merge(_batch(spark, [("r1", "b", "py", 30, "INSERT", 2)]),
            batch_id=2, mode="mor")
    view.refresh()
    # the view is a lake table: its refresh history time-travels
    old = view.read(snapshot=view.table.snapshot_at(v_before)).collect()
    assert old[0]["n_files"] == 1 and old[0]["total_size"] == 10
    new = view.read().collect()
    assert new[0]["n_files"] == 2 and new[0]["total_size"] == 40

    # min/max are supported via the touched-group recompute strategy
    mm = IncrementalAggView.create(spark, t, str(tmp_path / "v2"),
                                   dims=["lang"],
                                   aggs={"m": ("max", "size")})
    assert mm.needs_recompute
    assert mm.read().collect()[0]["m"] == 30


def test_view_randomized_against_recompute(spark, tmp_path):
    """Deterministic pseudo-random churn: 5 refresh cycles over a keyed
    stream with inserts/updates/deletes and dim moves; after every
    refresh the view equals the full recompute."""
    import random
    rng = random.Random(7)
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    view = None
    live = {}
    gtid = 0
    for cycle in range(5):
        rows = []
        for _ in range(40):
            gtid += 1
            key = (f"r{rng.randrange(6)}", f"f{rng.randrange(12)}")
            if key in live and rng.random() < 0.25:
                rows.append((*key, None, None, "DELETE", gtid))
                live.pop(key)
            else:
                lang = rng.choice(["py", "go", "rs", None])
                size = rng.choice([None, rng.randrange(100)])
                op = "UPDATE" if key in live else "INSERT"
                rows.append((*key, lang, size, op, gtid))
                live[key] = (lang, size)
        t.merge(_batch(spark, rows), batch_id=cycle + 1, mode="mor")
        if view is None:
            view = IncrementalAggView.create(
                spark, t, str(tmp_path / "v"), dims=["lang"], aggs=AGGS,
                num_buckets=2)
        else:
            view.refresh()
        _assert_view_matches(view, t)


def test_refresh_plan_prunes_view_to_touched_buckets(spark, tmp_path):
    """The refresh join reads ONLY the view buckets the changed groups
    hash to — a one-group change on a many-group view must not open the
    other buckets' files."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    rows = [(f"r{i}", f"f{i}", f"l{i % 16}", i, "INSERT", i + 1)
            for i in range(64)]  # 16 lang groups across 8 view buckets
    t.merge(_batch(spark, rows), batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS, num_buckets=8)
    view.table.compact()

    t.merge(_batch(spark, [("r0", "f0", "l0", 99, "UPDATE", 100)]),
            batch_id=2, mode="mor")
    from_v = view.source_version
    plan, cleanup = view._refresh_plan(from_v, t.snapshot.version, "auto")
    try:
        vroot = str(tmp_path / "v")
        vfiles = [p for p in plan.inputFiles() if vroot in p]
        by_path = {fi["path"]: fi["bucket"] for fi in view.table.snapshot.files}
        touched = {b for p, b in by_path.items() if any(p in f for f in vfiles)}
        assert len(touched) == 1  # only l0's bucket
        assert len({b for b in by_path.values()}) > 1  # prune was non-trivial
    finally:
        cleanup()
    view.refresh()
    _assert_view_matches(view, t)


def test_view_multi_dim(spark, tmp_path):
    """Two-dim view (lang, repo): dim tuples group/merge/delete
    correctly and match the recompute."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [
        ("r1", "a", "py", 10, "INSERT", 1),
        ("r1", "b", "py", 20, "INSERT", 2),
        ("r2", "c", "py", 30, "INSERT", 3),
        ("r2", "d", "go", 40, "INSERT", 4),
    ]), batch_id=1, mode="mor")
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["lang", "repo"],
        aggs={"n": ("count",), "s": ("sum", "size")}, num_buckets=2)
    t.merge(_batch(spark, [
        ("r1", "a", "go", 11, "UPDATE", 5),   # moves (py,r1) -> (go,r1)
        ("r2", "c", None, None, "DELETE", 6),  # (py,r2) -> zero
    ]), batch_id=2, mode="mor")
    view.refresh()
    got = {(r["lang"], r["repo"]): (r["n"], r["s"])
           for r in view.read().collect()}
    want = {(r["lang"], r["repo"]): (r["n"], r["s"])
            for r in t.read().groupBy("lang", "repo")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("size").cast("bigint").alias("s")).collect()}
    assert got == want
    assert ("py", "r2") not in got and ("go", "r1") in got


def test_view_survives_source_truncate_via_diff_fallback(spark, tmp_path):
    """A TRUNCATE in the refresh window (gate: truncate_gtid changed)
    forces the diff plan; every pre-truncate group must drop out of the
    view and post-truncate rows re-aggregate from scratch."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r2", "b", "go", 20, "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    t.truncate()
    t.merge(_batch(spark, [("r3", "c", "rs", 30, "INSERT", 3)]),
            batch_id=2, mode="mor")
    assert t.changes_plan(view.source_version) == "diff"
    view.refresh()
    _assert_view_matches(view, t)
    langs = {r["lang"] for r in view.read().collect()}
    assert langs == {"rs"}


def test_view_rebuild_after_watermark_expiry(spark, tmp_path):
    """When the source expires the view's watermark version, refresh()
    raises (the changes window is gone); rebuild() recovers with a full
    recompute in ONE atomic commit — a truncate marker kills every old
    group row in the same snapshot that adds the recomputed ones."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r2", "b", "go", 20, "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    for i in range(2, 8):   # advance the source well past the watermark
        t.merge(_batch(spark, [
            (f"r{i}", "c", "rs", i, "INSERT", i + 10),
            ("r2", "b", None, None, "DELETE", 100) if i == 4
            else (f"r{i}", "d", "py", i, "INSERT", i + 200),
        ]), batch_id=i, mode="mor")
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        view.refresh()
    m = view.rebuild()
    assert m.get("rebuilt") and m["to_version"] == t.snapshot.version
    _assert_view_matches(view, t)
    assert "go" not in {r["lang"] for r in view.read().collect()}
    # idempotent: a replayed rebuild is a no-op
    assert view.rebuild().get("skipped")
    # and incremental refresh resumes from the rebuilt watermark
    t.merge(_batch(spark, [("rz", "z", "zig", 1, "INSERT", 300)]),
            batch_id=9, mode="mor")
    view.refresh()
    _assert_view_matches(view, t)


def test_view_agg_name_collision_rejected(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    with pytest.raises(ValueError, match="collides"):
        IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                  dims=["lang"],
                                  aggs={"lang": ("count",)})
    with pytest.raises(ValueError, match="collides"):
        IncrementalAggView.create(spark, t, str(tmp_path / "v2"),
                                  dims=["lang"],
                                  aggs={"_rowcnt": ("count",)})


def test_view_refresh_across_source_schema_evolution(spark, tmp_path):
    """An ADD COLUMN lands inside the refresh window: the changelog's
    hybrid read maps old files to head's column ids, contributions carry
    the new column (NULL for pre-evolution winners), and the view still
    equals the recompute."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r2", "b", "go", 20, "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    t.add_column("stars", "int")
    wide = spark.createDataFrame(
        [("r3", "c", "py", 30, 5, "INSERT", 3),
         ("r1", "a", "py", 11, 2, "UPDATE", 4)],
        "repo string, path string, lang string, size int, stars int, "
        "_op string, _gtid long")
    t.merge(wide, batch_id=2, mode="mor")
    view.refresh()
    _assert_view_matches(view, t)

    # a NEW view over the evolved schema can aggregate the new column
    v2 = IncrementalAggView.create(
        spark, t, str(tmp_path / "v2"), dims=["lang"],
        aggs={"n": ("count",), "s_stars": ("sum", "coalesce(stars, 0)")})
    got = {r["lang"]: r["s_stars"] for r in v2.read().collect()}
    assert got == {"py": 7, "go": 0}


def test_view_changes_feeds_downstream(spark, tmp_path):
    """The view is itself a changelog source: after a refresh, the view
    table's changes() emits exactly the changed GROUPS (group-level
    CDC-out — the next consumer down the chain)."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r2", "b", "go", 20, "INSERT", 2),
                           ("r3", "c", "rs", 30, "INSERT", 3)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    v_before = view.table.snapshot.version
    t.merge(_batch(spark, [
        ("r1", "a2", "py", 5, "INSERT", 4),          # py group changes
        ("r2", "b", None, None, "DELETE", 5),         # go group -> zero
    ]), batch_id=2, mode="mor")
    view.refresh()
    ch = view.table.changes(v_before)
    got = {(r["lang"], r["_change_type"]) for r in ch.collect()}
    assert got == {("py", "UPDATE"), ("go", "DELETE")}  # rs untouched


def test_view_rejects_wrong_source_and_storage_collisions(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    # a DIFFERENT table with the same schema must not be accepted as the
    # source — a refresh against it would corrupt the view silently
    other = LakeTable.create(spark, str(tmp_path / "other"), SCHEMA,
                             ["repo", "path"], num_buckets=2)
    with pytest.raises(ValueError, match="tracks source"):
        IncrementalAggView.load(spark, other, str(tmp_path / "v"))
    # order-independent storage-column collision: both dict orders raise
    for aggs in ({"_sum_x": ("sum", "size"), "x": ("avg", "size")},
                 {"x": ("avg", "size"), "_sum_x": ("sum", "size")}):
        with pytest.raises(ValueError, match="collides"):
            IncrementalAggView.create(spark, t, str(tmp_path / "vx"),
                                      dims=["lang"], aggs=aggs)
    del view


def test_view_sum_is_null_for_all_null_group(spark, tmp_path):
    """SQL sum semantics: a group whose measure is NULL in every row
    reads back NULL (not the monoid's 0) — and flips to a value / back
    under incremental refresh."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", None, "INSERT", 1),
                           ("r2", "b", "go", 5, "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs=AGGS)
    row = {r["lang"]: r for r in view.read().collect()}
    assert row["py"]["total_size"] is None and row["py"]["n_files"] == 1
    assert row["go"]["total_size"] == 5
    t.merge(_batch(spark, [("r1", "a", "py", 7, "UPDATE", 3)]),
            batch_id=2, mode="mor")
    view.refresh()
    _assert_view_matches(view, t)
    row = {r["lang"]: r for r in view.read().collect()}
    assert row["py"]["total_size"] == 7


def test_cli_view_refresh_rebuild_flag(spark, tmp_path):
    """view-refresh --rebuild drives rebuild() through the CLI (in-process
    main(); the spark-submit surface is covered by the lifecycle test)."""
    import json as _json

    from th2_listener_mysql_binlog_go_spark.__main__ import main

    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1)]),
            batch_id=1, mode="mor")
    IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                              dims=["lang"], aggs=AGGS)
    t.merge(_batch(spark, [("r2", "b", "go", 20, "INSERT", 2)]),
            batch_id=2, mode="mor")
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["view-refresh", "--source", str(tmp_path / "src"),
                   "--view", str(tmp_path / "v"), "--rebuild"])
    assert rc == 0
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["rebuilt"] is True
    v = IncrementalAggView.load(spark, t, str(tmp_path / "v"))
    _assert_view_matches(v, t)


def test_view_format_stamp_guards_layout_drift(spark, tmp_path):
    """A view stamped with a different (or missing) storage-layout
    generation refuses to load — the SEQ_ENCODING precedent: a silent
    read would miss or misinterpret hidden storage columns."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["lang"], aggs=AGGS,
        num_buckets=2)
    assert IncrementalAggView.load(spark, t, str(tmp_path / "v"))  # current

    view.table.set_properties({"view_format": "1"})
    with pytest.raises(ValueError, match="storage layout"):
        IncrementalAggView.load(spark, t, str(tmp_path / "v"))


def _mm_recompute(source):
    return (source.read().groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("size").alias("lo"),
                 F.max("size").alias("hi"),
                 F.sum("size").cast("bigint").alias("tot")))


def test_minmax_view_tracks_recompute_under_deletes(spark, tmp_path):
    """min/max views use the touched-group recompute strategy: deleting
    the current extreme, lowering it via UPDATE, dim-moves, NULL
    measures, and delete-to-zero groups all land on the recompute truth
    after every refresh — the cases signed deltas cannot express."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a", "py", 10, "INSERT", 1),
        ("r1", "b", "py", 50, "INSERT", 2),
        ("r2", "c", "go", 30, "INSERT", 3),
        ("r2", "d", "go", None, "INSERT", 4),
        ("r3", "e", "rs", 70, "INSERT", 5),
    ]), batch_id=1, mode="mor")
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["lang"],
        aggs={"n": ("count",), "lo": ("min", "size"),
              "hi": ("max", "size"), "tot": ("sum", "size")},
        num_buckets=2)
    assert view.needs_recompute
    assert _rows(view.read()) == _rows(_mm_recompute(t))

    # delete the current max of py; lower go's max via UPDATE; dim-move
    # rs's only row into py (rs must become a DELETE row); add an
    # all-NULL group
    t.merge(_batch(spark, [
        ("r1", "b", "py", 50, "DELETE", 10),
        ("r2", "c", "go", 5, "UPDATE", 11),
        ("r3", "e", "py", 70, "UPDATE", 12),
        ("r4", "f", "zig", None, "INSERT", 13),
    ]), batch_id=2, mode="mor")
    view.refresh()
    got = {r["lang"]: (r["n"], r["lo"], r["hi"], r["tot"])
           for r in view.read().collect()}
    assert "rs" not in got                      # group died -> DELETE row
    assert got["py"] == (2, 10, 70, 80)         # old max gone, new member in
    assert got["go"] == (2, 5, 5, 5)            # max LOWERED (non-invertible)
    assert got["zig"] == (1, None, None, None)  # all-NULL extremes are NULL
    assert _rows(view.read()) == _rows(_mm_recompute(t))

    # crash-replay: same source version refreshes to a no-op
    assert view.refresh()["skipped"] is True

    # refresh history time-travels like any lake table
    assert len(view.table.history()) >= 2


def test_minmax_refresh_restricts_source_read(spark, tmp_path):
    """The recompute strategy must NOT recompute untouched groups, and
    the membership predicate must land where the LWW window allows:
    KEY dims push through the window into the parquet scan
    (PushedFilters); non-key dims filter immediately above the window
    (membership is only knowable post-LWW). Both plans emit rows for
    the touched groups ONLY."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    rows = [(f"r{i % 5}", f"f{i}", ["py", "go", "rs", "md"][i % 4],
             (i * 7) % 100, "INSERT", i + 1) for i in range(80)]
    t.merge(_batch(spark, rows), batch_id=1, mode="mor")

    # non-key dim (lang): filter above the window, touched groups only
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["lang"],
        aggs={"hi": ("max", "size")}, num_buckets=4)
    t.merge(_batch(spark, [("r0", "f0", "py", 1, "UPDATE", 1000)]),
            batch_id=2, mode="mor")
    rows_df, cleanup = view._refresh_plan(
        view.source_version, t.snapshot.version, "auto")
    try:
        plan = rows_df._jdf.queryExecution().executedPlan().toString()
        assert any("Filter" in ln and "lang" in ln and
                   ("= py" in ln or "IN (py" in ln)
                   for ln in plan.splitlines()), plan
        out = rows_df.collect()
    finally:
        cleanup()
    assert {r["lang"] for r in out} == {"py"}   # only the touched group
    view.refresh()
    assert _rows(view.read()) == _rows(
        t.read().groupBy("lang").agg(F.max("size").alias("hi")))

    # KEY dim (repo): the predicate reaches the source FileScan — and
    # the UPDATE's before-image dim must come from the after image (the
    # _before struct has no key columns)
    view2 = IncrementalAggView.create(
        spark, t, str(tmp_path / "v2"), dims=["repo"],
        aggs={"hi": ("max", "size")}, num_buckets=4)
    t.merge(_batch(spark, [("r1", "f1", "go", 2, "UPDATE", 1001)]),
            batch_id=3, mode="mor")
    rows_df2, cleanup2 = view2._refresh_plan(
        view2.source_version, t.snapshot.version, "auto")
    try:
        plan2 = rows_df2._jdf.queryExecution().executedPlan().toString()
        # The changes() subplan's keyset prefilter ALSO pushes
        # EqualTo(repo,..) — but always together with EqualTo(path,..)
        # (both key columns), so matching any repo pushdown would be
        # vacuously green even if the RECOMPUTE prefilter regressed.
        # Demand a PushedFilters bracket that restricts repo and NOT
        # path: only the recompute scan produces that.
        import re
        pfs = re.findall(r"PushedFilters: \[([^\]]*)\]", plan2)
        assert any(("In(repo" in pf or "EqualTo(repo" in pf)
                   and "path" not in pf for pf in pfs), plan2
        out2 = rows_df2.collect()
    finally:
        cleanup2()
    assert {r["repo"] for r in out2} == {"r1"}
    view2.refresh()
    assert _rows(view2.read()) == _rows(
        t.read().groupBy("repo").agg(F.max("size").alias("hi")))


def test_minmax_refresh_empty_net_window_short_circuits(spark, tmp_path):
    """A window whose NET change is empty (rewrites to identical values
    are elided by changes()'s state-diff semantics) must not plan an
    O(source) semi join at all: the recompute path short-circuits to a
    watermark-only merge (zero FileScans in the rows plan), and the
    watermark still advances so the next refresh windows correctly."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r2", "b", "go", 20, "INSERT", 2)]),
            batch_id=1, mode="mor")
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["lang"],
        aggs={"hi": ("max", "size")}, num_buckets=2)

    # rewrite to IDENTICAL values: net changes() is empty
    t.merge(_batch(spark, [("r1", "a", "py", 10, "UPDATE", 3),
                           ("r2", "b", "go", 20, "UPDATE", 4)]),
            batch_id=2, mode="mor")
    rows_df, cleanup = view._refresh_plan(
        view.source_version, t.snapshot.version, "auto")
    try:
        plan = rows_df._jdf.queryExecution().executedPlan().toString()
        assert "FileScan" not in plan, plan   # short-circuit, not AQE luck
        assert rows_df.collect() == []
    finally:
        cleanup()
    view.refresh()
    assert view.source_version == t.snapshot.version  # watermark advanced
    assert _rows(view.read()) == _rows(
        t.read().groupBy("lang").agg(F.max("size").alias("hi")))

    # and the window AFTER the no-op still refreshes correctly
    t.merge(_batch(spark, [("r1", "a", "py", 99, "UPDATE", 5)]),
            batch_id=3, mode="mor")
    view.refresh()
    assert _rows(view.read()) == _rows(
        t.read().groupBy("lang").agg(F.max("size").alias("hi")))


def test_minmax_refresh_with_probe_like_column_names(spark, tmp_path):
    """The recompute join must stay unambiguous even when the SOURCE
    carries columns spelled like plan-introduced names (`_t_<dim>`) or
    an agg output is named `_a_<dim>` — alias-qualified joins leave no
    reserved rename namespace to collide with."""
    schema = [("repo", "string"), ("path", "string"), ("lang", "string"),
              ("_t_lang", "int"), ("size", "int")]
    ddl = ("repo string, path string, lang string, _t_lang int, "
           "size int, _op string, _gtid long")
    t = LakeTable.create(spark, str(tmp_path / "src"), schema,
                         ["repo", "path"], num_buckets=4)
    t.merge(spark.createDataFrame(
        [("r1", "a", "py", 7, 10, "INSERT", 1),
         ("r1", "b", "py", 8, 50, "INSERT", 2),
         ("r2", "c", "go", 9, 30, "INSERT", 3)], ddl),
        batch_id=1, mode="mor")
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["lang"],
        aggs={"hi": ("max", "size"), "_a_lang": ("min", "_t_lang")},
        num_buckets=2)
    t.merge(spark.createDataFrame(
        [("r1", "b", "py", 2, 60, "UPDATE", 4),
         ("r2", "c", "go", 9, 30, "DELETE", 5)], ddl),
        batch_id=2, mode="mor")
    view.refresh()
    got = {r["lang"]: (r["hi"], r["_a_lang"])
           for r in view.read().collect()}
    assert got == {"py": (60, 2)}
    assert _rows(view.read()) == _rows(
        t.read().groupBy("lang").agg(F.max("size").alias("hi"),
                                     F.min("_t_lang").alias("_a_lang")))


def test_minmax_mixed_key_and_nonkey_dims(spark, tmp_path):
    """One view whose dims mix a KEY column (repo — prefilter reaches
    the scan) and a non-key column (lang — filter above the window),
    exercising the before-image split in `_refresh_recompute`'s touched
    set: a dim-move touches both (repo,lang) sides, a delete empties a
    group, and a NULL-dim group updates in place."""
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a", "py", 10, "INSERT", 1),
        ("r1", "b", "go", 20, "INSERT", 2),
        ("r2", "c", "py", 30, "INSERT", 3),
        ("r2", "d", None, 40, "INSERT", 4),
    ]), batch_id=1, mode="mor")
    view = IncrementalAggView.create(
        spark, t, str(tmp_path / "v"), dims=["repo", "lang"],
        aggs={"n": ("count",), "hi": ("max", "size")}, num_buckets=4)

    t.merge(_batch(spark, [
        ("r1", "b", "py", 21, "UPDATE", 10),    # dim-move go->py within r1
        ("r2", "c", "py", 30, "DELETE", 11),    # (r2,py) group dies
        ("r2", "d", None, 45, "UPDATE", 12),    # NULL-dim group updates
    ]), batch_id=2, mode="mor")
    view.refresh()
    want = _rows(t.read().groupBy("repo", "lang").agg(
        F.count(F.lit(1)).alias("n"), F.max("size").alias("hi")))
    assert _rows(view.read()) == want
    langs = {(r["repo"], r["lang"]) for r in view.read().collect()}
    assert ("r1", "go") not in langs and ("r2", "py") not in langs
    assert ("r2", None) in langs


def test_refresh_all_orders_chained_views(spark, tmp_path):
    """refresh_all() refreshes a rollup chain upstream-first regardless
    of input order, landing every view on a consistent cut: the
    second-level view consumes its upstream's POST-refresh version."""
    from th2_listener_mysql_binlog_go_spark.plans.matview import refresh_all

    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a", "py", 10, "INSERT", 1),
        ("r1", "b", "go", 20, "INSERT", 2),
        ("r2", "c", "py", 30, "INSERT", 3),
    ]), batch_id=1, mode="mor")
    a = IncrementalAggView.create(
        spark, t, str(tmp_path / "a"), dims=["repo", "lang"],
        aggs={"n": ("count",)}, num_buckets=2)
    # second level: per-repo file counts, summed from A's liveness counts
    b = IncrementalAggView.create(
        spark, a.table, str(tmp_path / "b"), dims=["repo"],
        aggs={"files": ("sum", "_rowcnt")}, num_buckets=2)

    t.merge(_batch(spark, [
        ("r1", "d", "rs", 5, "INSERT", 4),
        ("r2", "c", None, None, "DELETE", 5),   # (r2,py) group dies
    ]), batch_id=2, mode="mor")

    res = refresh_all([b, a])                   # dependent listed FIRST
    order = list(res)
    import os as _os
    assert order == [_os.path.realpath(str(tmp_path / "a")),
                     _os.path.realpath(str(tmp_path / "b"))]
    assert b.source_version == a.table.snapshot.version  # consistent cut
    got = {r["repo"]: r["files"] for r in b.read().collect()}
    want = {r["repo"]: r["files"] for r in t.read().groupBy("repo").agg(
        F.count(F.lit(1)).alias("files")).collect()}
    assert got == want and "r2" not in got


def test_refresh_all_rejects_cycles_and_duplicates(spark, tmp_path):
    from types import SimpleNamespace

    from th2_listener_mysql_binlog_go_spark.plans.matview import refresh_all

    def fake(root, src_root):
        return SimpleNamespace(table=SimpleNamespace(root=root),
                               source=SimpleNamespace(root=src_root),
                               refresh=lambda mode="auto": {"root": root})

    x, y = fake("/tmp/vx", "/tmp/vy"), fake("/tmp/vy", "/tmp/vx")
    try:
        refresh_all([x, y])
        raise AssertionError("expected ValueError on a cycle")
    except ValueError as e:
        assert "cycle" in str(e)
    try:
        refresh_all([fake("/tmp/vz", "/s"), fake("/tmp/vz", "/s")])
        raise AssertionError("expected ValueError on duplicates")
    except ValueError as e:
        assert "duplicate" in str(e)
    # independent views keep input order
    r = refresh_all([fake("/tmp/v2", "/s1"), fake("/tmp/v1", "/s2")])
    assert list(r) == ["/tmp/v2", "/tmp/v1"]
