"""key_history(): the per-key audit read — every retained change event
for one key, ordered by (_gtid, _seq), bucket-pruned, with the LWW
winner flagged. Reference parity: downstream consumers correlating a
key's lifecycle from the published event stream (listener.go:296-315)."""

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("lang", "string"),
          ("size", "int")]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, lang string, size int, "
              "_op string, _gtid long")


def _hist(table, *key):
    return [(r["_gtid"], r["_op"], r["size"], r["_is_current"])
            for r in table.key_history(*key).collect()]


def test_key_history_orders_events_and_flags_winner(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a", "py", 10, "INSERT", 1),
        ("r2", "b", "go", 5, "INSERT", 2),
        ("r1", "a", "py", 20, "UPDATE", 3),
    ]), batch_id=1, mode="mor")
    t.merge(_batch(spark, [
        ("r1", "a", "py", 30, "UPDATE", 4),
        ("r1", "a", None, None, "DELETE", 5),
        ("r1", "a", "py", 40, "INSERT", 6),   # resurrection
    ]), batch_id=2, mode="mor")

    assert _hist(t, "r1", "a") == [
        (1, "INSERT", 10, False),
        (3, "UPDATE", 20, False),
        (4, "UPDATE", 30, False),
        (5, "DELETE", None, False),
        (6, "INSERT", 40, True),
    ]
    # the flagged winner row agrees with read()
    cur = t.read().filter("repo = 'r1' and path = 'a'").collect()
    assert len(cur) == 1 and cur[0]["size"] == 40


def test_key_history_deleted_key_has_no_current(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1)]),
            batch_id=1, mode="mor")
    t.merge(_batch(spark, [("r1", "a", None, None, "DELETE", 2)]),
            batch_id=2, mode="mor")
    h = _hist(t, "r1", "a")
    assert [x[1] for x in h] == ["INSERT", "DELETE"]
    assert not any(x[3] for x in h)          # no current version
    assert t.read().filter("repo = 'r1' and path = 'a'").count() == 0

    # absent key: empty frame, full audit schema
    empty = t.key_history("nope", "nope")
    assert empty.count() == 0
    assert {"_gtid", "_seq", "_op", "_is_current"} <= set(empty.columns)


def test_key_history_folds_under_compaction_and_time_travels(spark, tmp_path):
    """Compaction folds a key's prefix into one KEEP row carrying the
    surviving image (a deleted key's tombstone does not survive); the
    pre-fold history stays reachable via an older snapshot."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a", "py", 10, "INSERT", 1),
        ("r1", "a", "py", 20, "UPDATE", 2),
        ("r2", "b", "go", 5, "INSERT", 3),
        ("r2", "b", None, None, "DELETE", 4),
    ]), batch_id=1, mode="mor")
    v_pre = t.snapshot.version
    t.compact()

    assert _hist(t, "r1", "a") == [(2, "KEEP", 20, True)]
    assert _hist(t, "r2", "b") == []         # tombstone folded away
    # time travel reaches the unfolded history
    assert _hist(LakeTable.load(spark, str(tmp_path / "t")), "r1", "a") == \
        [(2, "KEEP", 20, True)]
    old = [(r["_gtid"], r["_op"], r["_is_current"])
           for r in t.key_history("r2", "b",
                                  snapshot=t.snapshot_at(v_pre)).collect()]
    assert old == [(3, "INSERT", False), (4, "DELETE", False)]

    # post-fold events append to the folded prefix
    t.merge(_batch(spark, [("r1", "a", "py", 99, "UPDATE", 9)]),
            batch_id=2, mode="mor")
    assert _hist(t, "r1", "a") == [(2, "KEEP", 20, False),
                                   (9, "UPDATE", 99, True)]


def test_key_history_respects_truncate_marker(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [("r1", "a", "py", 10, "INSERT", 1),
                           ("r1", "a", "py", 20, "UPDATE", 2)]),
            batch_id=1, mode="mor")
    t.merge(_batch(spark, [("r1", "a", "py", 30, "INSERT", 7)]),
            batch_id=2, mode="mor",
            extra_properties={"truncate_gtid": "5"})
    # rows at or below the marker are dead — history starts after it
    assert _hist(t, "r1", "a") == [(7, "INSERT", 30, True)]


def test_key_history_prunes_to_one_bucket(spark, tmp_path):
    """The plan must open ONLY the key's bucket's files — the lookup()
    contract, asserted on the audit read's inputFiles."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=8)
    rows = [(f"r{i}", f"p{i}", "py", i, "INSERT", i + 1) for i in range(64)]
    t.merge(_batch(spark, rows), batch_id=1, mode="mor")
    snap = t.snapshot
    assert len({fi["bucket"] for fi in snap.files}) > 1
    df = t.key_history("r7", "p7")
    read_files = set(df.inputFiles())
    b7 = t._key_bucket_snapshot(snap, ("r7", "p7"))
    bucket_files = {f for f in
                    (str(t.root) + "/" + fi["path"] for fi in b7.files)}
    assert read_files and all(
        any(rf.endswith(bf.split("/", 1)[-1]) or bf in rf
            for bf in bucket_files) for rf in read_files), (
        read_files, bucket_files)
    assert [r["size"] for r in df.collect()] == [7]
