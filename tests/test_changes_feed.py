"""ChangesFeedPublisher: the lake re-publishing its own history as wire
payloads (full-circle CDC), consumed back by the standard wire applier."""

import os

import pyspark.sql.functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.streaming.structured import (
    ChangesFeedPublisher,
    StreamingWireApplier,
)

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _mk(spark, root, buckets=4):
    return LakeTable.create(spark, root, SCHEMA, ["repo", "path"],
                            num_buckets=buckets)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, _op string, _gtid long",
    )


def _drain(spark, tmp_path, out, name):
    t2 = _mk(spark, str(tmp_path / name))
    q = StreamingWireApplier(spark, t2).start(
        out, str(tmp_path / f"{name}_ckpt"), available_now=True)
    q.awaitTermination(300)
    return t2


def _state(t):
    return sorted(map(tuple, t.read().collect()))


def test_changes_feed_full_circle(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r1", "b.py", "c2", "py", "v2", "INSERT", 2),
        ("r2", "c.py", "c3", "go", "v3", "INSERT", 3),
    ]), batch_id=1, mode="mor")
    out = str(tmp_path / "queue")
    feed = ChangesFeedPublisher(spark, t.root, out, max_size=4096)

    m1 = feed.poll()  # bootstrap: whole state as INSERT beans
    # the poll's version clock stamps one gtid per window, so same-op
    # rows batch into ONE bean (size permitting)
    assert m1["payloads"] == 1 and m1["plan"] == "incremental"

    t.merge(_changes(spark, [
        ("r1", "a.py", "c4", "py", "v1b", "UPDATE", 4),
        ("r1", "b.py", None, None, None, "DELETE", 5),
        ("r3", "d.py", "c5", "rs", "v5", "INSERT", 6),
    ]), batch_id=2, mode="mor")
    m2 = feed.poll()
    assert m2["from_version"] == m1["published_version"]
    assert m2["payloads"] == 3 and m2["plan"] == "incremental"  # one bean per op
    assert feed.poll()["plan"] == "noop"  # idle loop: nothing new

    # the published Update bean carries the REAL Before image
    raw = spark.read.json(out)
    upd = raw.filter(F.col("payload").contains('"Updated"')).collect()
    assert len(upd) == 1 and '"commit":"c1"' in upd[0]["payload"]

    t2 = _drain(spark, tmp_path, out, "t2")
    assert _state(t2) == _state(t) and len(_state(t)) == 3


def test_changes_feed_redelivery_and_fallback(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r2", "b.py", "c2", "go", "v2", "INSERT", 2),
    ]), batch_id=1, mode="mor")
    out = str(tmp_path / "queue")
    feed = ChangesFeedPublisher(spark, t.root, out, max_size=4096)
    m1 = feed.poll()

    # crash between payload write and progress swap: progress lost,
    # the window re-publishes — consumers must converge on duplicates
    os.remove(feed._progress_path)
    m1b = feed.poll()
    assert m1b["payloads"] == m1["payloads"]

    # a compaction inside the next window: auto mode falls back to diff
    t.merge(_changes(spark, [
        ("r1", "a.py", "c3", "py", "v1b", "UPDATE", 3),
    ]), batch_id=2, mode="mor")
    t.compact()
    m2 = feed.poll()
    assert m2["plan"] == "diff" and m2["payloads"] == 1

    t2 = _drain(spark, tmp_path, out, "t2")
    assert _state(t2) == _state(t) and len(_state(t)) == 2


def test_changes_feed_bootstrap_after_expiry(spark, tmp_path):
    """A feed's FIRST poll on a maintained table (v0 long expired) must
    still bootstrap: whole current state as INSERT beans, then normal
    incremental polls."""
    import pytest

    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_changes(spark, [
        ("r1", "a.py", "c1", "py", "v1", "INSERT", 1),
        ("r2", "b.py", "c2", "go", "v2", "INSERT", 2),
    ]), batch_id=1, mode="mor")
    t.merge(_changes(spark, [
        ("r1", "a.py", "c3", "py", "v1b", "UPDATE", 3),
    ]), batch_id=2, mode="mor")
    t.expire_snapshots(keep_last=1)  # v0 (and v1) are gone

    out = str(tmp_path / "queue")
    feed = ChangesFeedPublisher(spark, t.root, out, max_size=4096)
    m1 = feed.poll()
    assert m1["plan"] == "bootstrap" and m1["payloads"] == 1  # one INSERT bean

    t.merge(_changes(spark, [
        ("r3", "c.py", "c4", "rs", "v4", "INSERT", 4),
    ]), batch_id=3, mode="mor")
    m2 = feed.poll()
    assert m2["plan"] == "incremental" and m2["payloads"] == 1

    t2 = _drain(spark, tmp_path, out, "t2")
    assert _state(t2) == _state(t) and len(_state(t)) == 3

    # a LAGGED feed whose committed watermark expired is unrecoverable
    # (the lost window's DELETEs cannot be re-derived) -> clear error
    feed._commit_progress(1)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="retention outran the feed"):
        feed.poll()


def test_feed_bulk_update_publishes_bounded_beans(spark, tmp_path):
    """Update beans are UNSPLITTABLE (reference parity), and a bulk
    update_where stamps every victim with one (_gtid,_seq) — under the
    version clock that identity would batch thousands of rows into one
    multi-MB bean. The per-key hashed UPDATE slot must keep each Update
    payload a handful of rows."""
    from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        synthetic_changestream,
    )
    from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

    SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
              ("lang", "string"), ("content", "string")]
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    full = synthetic_changestream(spark, 1500, n_repos=15, n_paths=30,
                                  truncate_per_10k=0)
    ReplayRunner(spark, t, batch_span=750).run(full)
    feed = ChangesFeedPublisher(spark, t.root, str(tmp_path / "q"),
                                max_size=1 << 14)
    feed.poll()
    n_py = t.read().filter("lang = 'py'").count()
    t.update_where("lang = 'py'", {"commit": "'REDACTED'"})
    feed.poll()

    raw = spark.read.json(str(tmp_path / "q"))
    upd = raw.filter(F.col("payload").contains('"Updated"'))
    n_beans = upd.count()
    assert n_py > 20 and n_beans >= n_py * 0.9  # ~one bean per key, no mega bean
    assert upd.select(F.max(F.length("payload"))).first()[0] <= (1 << 14)
