"""changes() keyset pushdown: the incremental plan's old-state read is
prefiltered to the window's changed keys — identical results to the
unfiltered plan, with the key predicate pushed into the old-side scans."""

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("content", "string")]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, _op string, _gtid long")


def _norm(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t))


def test_keyset_prefilter_matches_unfiltered_and_pushes_down(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    rows = [(f"r{i % 20}", f"f{i}", f"v{i}", "INSERT", i + 1) for i in range(200)]
    t.merge(_batch(spark, rows), batch_id=1, mode="mor")
    v0 = t.snapshot.version
    t.merge(_batch(spark, [
        ("r3", "f3", "v3b", "UPDATE", 500),
        ("r5", "f5", None, "DELETE", 501),
        ("rX", "fX", "new", "INSERT", 502),
        ("r7", "f7", "v7", "UPDATE", 503),   # no-op rewrite: must not emit
    ]), batch_id=2, mode="mor")

    assert t.changes_plan(v0) == "incremental"
    fast = t.changes(v0)                                # prefilter on (default)
    slow = t.changes(v0, keyset_pushdown_max=0)         # prefilter off
    diff = t.changes(v0, mode="diff")
    assert _norm(fast) == _norm(slow) == _norm(diff)

    # the changed-key predicate reached the old-side parquet scan
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "In(repo, " in plan or "In(path, " in plan, plan

    # with_before parity under the prefilter
    fb = t.changes(v0, with_before=True).select(
        "repo", "path", "_change_type", F.col("_before.content").alias("bc"))
    sb = t.changes(v0, with_before=True, keyset_pushdown_max=0).select(
        "repo", "path", "_change_type", F.col("_before.content").alias("bc"))
    assert _norm(fb) == _norm(sb)
    before = {(r["repo"], r["path"]): r["bc"] for r in fb.collect()}
    assert before[("r3", "f3")] == "v3"     # UPDATE carries the old value
    assert before[("rX", "fX")] is None     # INSERT has no before image


def test_keyset_prefilter_handles_null_key_components(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [
        ("r1", None, "a", "INSERT", 1),     # NULL key component
        ("r1", "p1", "b", "INSERT", 2),
        ("r2", "p2", "c", "INSERT", 3),
    ]), batch_id=1, mode="mor")
    v0 = t.snapshot.version
    t.merge(_batch(spark, [
        ("r1", None, "a2", "UPDATE", 10),   # must find its before image
        ("r2", "p2", None, "DELETE", 11),
    ]), batch_id=2, mode="mor")
    fast = t.changes(v0)
    slow = t.changes(v0, keyset_pushdown_max=0)
    assert _norm(fast) == _norm(slow)
    got = {(r["repo"], r["path"]): r["_change_type"] for r in fast.collect()}
    assert got == {("r1", None): "UPDATE", ("r2", "p2"): "DELETE"}


def test_keyset_prefilter_disengages_over_cap(spark, tmp_path):
    """More changed keys than the cap: the bounded probe gives up and the
    unfiltered plan runs — results identical."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    rows = [(f"r{i}", f"f{i}", f"v{i}", "INSERT", i + 1) for i in range(50)]
    t.merge(_batch(spark, rows), batch_id=1, mode="mor")
    v0 = t.snapshot.version
    upd = [(f"r{i}", f"f{i}", f"u{i}", "UPDATE", 100 + i) for i in range(50)]
    t.merge(_batch(spark, upd), batch_id=2, mode="mor")
    capped = t.changes(v0, keyset_pushdown_max=10)   # 50 keys > cap
    full = t.changes(v0, keyset_pushdown_max=0)
    assert _norm(capped) == _norm(full)
    assert capped.count() == 50


def test_keyset_prefilter_engages_on_binary_keys(spark, tmp_path):
    """bytearray key values (how Spark returns binary) are normalized to
    hashable bytes, so the prefilter ENGAGES on binary-keyed tables — and
    the binary membership predicate reaches the scan (a single changed
    key folds isin -> EqualTo; either spelling proves engagement). (The
    TypeError arm covers genuinely unhashable key types like arrays.)"""
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        [("kid", "binary"), ("content", "string")], ["kid"], num_buckets=2)

    def _b(rows):
        return spark.createDataFrame(
            rows, "kid binary, content string, _op string, _gtid long")
    t.merge(_b([(bytes([1, i]), f"v{i}", "INSERT", i + 1) for i in range(8)]),
            batch_id=1, mode="mor")
    v0 = t.snapshot.version
    t.merge(_b([(bytes([1, 3]), "v3b", "UPDATE", 100)]), batch_id=2, mode="mor")
    df = t.changes(v0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any("kid" in ln and ("In(" in ln or " IN " in ln or "INSET" in ln.upper()
                                or "EqualTo(kid" in ln or "kid#" in ln and " = 0x" in ln)
               for ln in plan.splitlines()
               if "Filter" in ln or "FileScan" in ln), plan
    ch = df.collect()
    assert len(ch) == 1 and ch[0]["_change_type"] == "UPDATE"
    assert bytes(ch[0]["kid"]) == bytes([1, 3])


def test_changes_plan_rejects_interleaved_gtid_commits(spark, tmp_path):
    """Soundness (found by the streaming-view test): a later MOR commit
    can carry OLDER gtids than an earlier one (file-paced streaming
    epochs). The incremental plan would let the window's winner override
    the old state even though read-time LWW keeps the newer value — the
    gate must detect the interleaving from the stamped gtid envelopes
    and fall back to the diff plan, whose answer matches the table."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    t.merge(_batch(spark, [("r1", "f1", "NEW", "INSERT", 100)]),
            batch_id=1, mode="mor")
    v0 = t.snapshot.version
    # the out-of-order commit: an OLDER event for the same key
    t.merge(_batch(spark, [("r1", "f1", "OLD", "UPDATE", 50),
                           ("r2", "f2", "x", "INSERT", 51)]),
            batch_id=2, mode="mor")

    # read-time LWW keeps the newer value
    state = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert state[("r1", "f1")] == "NEW"

    assert t.changes_plan(v0) == "diff"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsound"):
        t.changes(v0, mode="incremental")
    ch = {(r["repo"], r["path"]): r["_change_type"]
          for r in t.changes(v0).collect()}
    # only the genuinely-new key changed; r1/f1's stale event is NOT an update
    assert ch == {("r2", "f2"): "INSERT"}

    # a monotone follow-up window is incremental again
    v1 = t.snapshot.version
    t.merge(_batch(spark, [("r3", "f3", "y", "INSERT", 200)]),
            batch_id=3, mode="mor")
    assert t.changes_plan(v1) == "incremental"
