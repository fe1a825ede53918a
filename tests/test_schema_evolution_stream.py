"""DDL interception end-to-end: an ALTER event mid-batch splits the batch,
evolves the table schema between the segments, and later merges see the
new column (SURVEY.md §7 hard part (c))."""

import pyspark.sql.functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import BatchApplier
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import CHANGE_SCHEMA

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _event(gtid, op, repo=None, path=None, content=None, ddl=None, table_name="files"):
    row = (repo, path, "c" * 40, "py", content) if repo else None
    return (
        gtid, "binlog.000001", gtid * 256, gtid // 3, gtid, "repos", table_name, op,
        row if op in ("UPDATE", "DELETE") else None,
        row if op in ("INSERT", "UPDATE") else None,
        ddl,
    )


def test_alter_mid_batch_splits_and_applies(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=4)
    applier = BatchApplier(table)

    batch = spark.createDataFrame(
        [
            _event(1, "INSERT", "r1", "a.py", "v1"),
            _event(2, "INSERT", "r2", "b.py", "v2"),
            _event(3, "ALTER_TABLE", ddl="ALTER TABLE repos.files ADD COLUMN stars INT;"),
            _event(4, "UPDATE", "r1", "a.py", "v1b"),
            _event(5, "INSERT", "r3", "c.py", "v3"),
        ],
        CHANGE_SCHEMA,
    )
    m = applier.apply(batch, batch_id=1)
    assert m["ddl_applied"] == 1
    assert m["segments"] == 2  # split at the ALTER boundary
    cols = [c.name for c in table.snapshot.columns]
    assert cols == ["repo", "path", "commit", "lang", "content", "stars"]
    rows = {r["repo"]: r for r in table.read().collect()}
    assert rows["r1"]["content"] == "v1b" and rows["r1"]["stars"] is None
    assert set(rows) == {"r1", "r2", "r3"}

    # a later merge carrying the evolved column lands values
    table.merge(
        spark.createDataFrame(
            [("r4", "d.py", "c" * 40, "go", "v4", 7, "INSERT", 10)],
            "repo string, path string, commit string, lang string, content string, "
            "stars int, _op string, _gtid long",
        ),
        batch_id=5000,
        mode="mor",
    )
    rows = {r["repo"]: r for r in table.read().collect()}
    assert rows["r4"]["stars"] == 7 and rows["r1"]["stars"] is None

    # rename keeps data (id-stable), non-widening modify is rejected+skipped
    batch2 = spark.createDataFrame(
        [
            _event(20, "ALTER_TABLE", ddl="ALTER TABLE repos.files RENAME COLUMN lang TO language"),
            _event(21, "ALTER_TABLE", ddl="ALTER TABLE repos.files MODIFY COLUMN stars BIGINT"),
            _event(22, "INSERT", "r5", "e.py", "v5"),
        ],
        CHANGE_SCHEMA,
    )
    m2 = applier.apply(batch2, batch_id=6)
    assert m2["ddl_applied"] == 2
    got = {r["repo"]: r for r in table.read().collect()}
    assert got["r1"]["language"] == "py"
    assert table.snapshot.columns[5].type == "bigint"
    assert got["r4"]["stars"] == 7


def test_truncate_marker_semantics(spark, tmp_path):
    """TRUNCATE as GTID marker: wipes only rows last-written at or before
    it — later-gtid rows survive even if applied earlier (order-safe)."""
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=4)
    applier = BatchApplier(table)
    # batch 1 applies gtids 1..10 (including gtid 9 > the future truncate)
    b1 = spark.createDataFrame(
        [_event(1, "INSERT", "r1", "a.py", "old"),
         _event(9, "INSERT", "r9", "z.py", "survives")],
        CHANGE_SCHEMA,
    )
    applier.apply(b1, batch_id=1)
    # batch 2 carries an out-of-order TRUNCATE at gtid 5
    b2 = spark.createDataFrame(
        [_event(5, "TRUNCATE", ddl="TRUNCATE TABLE repos.files;"),
         _event(6, "INSERT", "r6", "f.py", "new")],
        CHANGE_SCHEMA,
    )
    m = applier.apply(b2, batch_id=2)
    assert m["ddl_applied"] == 1
    rows = {r["repo"] for r in table.read().collect()}
    assert rows == {"r9", "r6"}  # r1 (gtid 1 <= 5) truncated; r9 survives
    assert table.truncate_gtid == 5
