"""Parquet bloom filters on the key columns (`bloom_keys` table property):
point reads (`lookup` / `key_history`) push a key-equality predicate into
every file of ONE bucket; min/max stats only prune row groups when the
data is key-clustered, which delta files never are — blooms let the
reader skip unsorted row groups on a membership test. Presence is
asserted by byte delta (same rows written with vs without the property;
parquet writes are deterministic, so the growth IS the bloom bytes), and
correctness by lookup parity. parquet-mr omits blooms for fully
dictionary-encoded chunks and adaptive sizing right-sizes the rest, so
the property is safe to leave on (documented trade: ~bloom_max_bytes/16
minimum per non-dict key chunk)."""

import os

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("doc_id", "string"), ("rev", "string"), ("content", "string")]


def _batch(spark, n, gtid0=0):
    # md5-shaped high-cardinality keys: the dictionary fallback kicks in
    # and parquet-mr actually writes the blooms
    return spark.range(n).selectExpr(
        f"md5(concat('k', id)) as doc_id",
        "concat('r', id) as rev",
        "repeat('x', 64) as content",
        "'INSERT' as _op",
        f"id + {gtid0} as _gtid",
    )


def _data_bytes(root):
    total = 0
    for dirpath, _dirs, fnames in os.walk(os.path.join(root, "data")):
        for fn in fnames:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def _mk_pair(spark, tmp_path, n=6000):
    plain = LakeTable.create(spark, str(tmp_path / "plain"), SCHEMA,
                             ["doc_id"], num_buckets=2)
    bloom = LakeTable.create(spark, str(tmp_path / "bloom"), SCHEMA,
                             ["doc_id"], num_buckets=2,
                             properties={"bloom_keys": "true",
                                         "bloom_max_bytes": "65536"})
    b = _batch(spark, n).coalesce(2)
    plain.merge(b, batch_id=1, mode="mor")
    bloom.merge(b, batch_id=1, mode="mor")
    return plain, bloom


def test_bloom_bytes_written_and_lookup_parity(spark, tmp_path):
    plain, bloom = _mk_pair(spark, tmp_path)
    assert _data_bytes(bloom.root) > _data_bytes(plain.root)

    # the options target exactly the key columns, epoch physical names
    opts = bloom._bloom_write_options()
    assert opts["parquet.bloom.filter.enabled#doc_id"] == "true"
    assert "parquet.bloom.filter.enabled#rev" not in opts
    assert plain._bloom_write_options() == {}

    key = spark.sql("select md5('k17')").first()[0]
    a = [r.asDict() for r in plain.lookup(key).collect()]
    b = [r.asDict() for r in bloom.lookup(key).collect()]
    assert a == b and len(a) == 1 and a[0]["rev"] == "r17"
    # absent key: bloom table answers empty, not wrong
    assert bloom.lookup("no-such-key").count() == 0


def test_bloom_survives_compaction_and_rename(spark, tmp_path):
    plain, bloom = _mk_pair(spark, tmp_path, n=4000)
    plain.compact()
    bloom.compact()
    assert _data_bytes(bloom.root) > _data_bytes(plain.root)

    # a renamed key keeps blooms under the NEW physical name
    bloom.rename_column("doc_id", "document_id")
    opts = bloom._bloom_write_options()
    assert opts["parquet.bloom.filter.enabled#document_id"] == "true"
    assert not any(k.endswith("#doc_id") for k in opts)

    before = _data_bytes(bloom.root)
    bloom.merge(
        _batch(spark, 3000, gtid0=10_000)
        .withColumnRenamed("doc_id", "document_id").coalesce(2),
        batch_id=2, mode="mor")
    assert _data_bytes(bloom.root) > before
    got = [r.asDict() for r in bloom.lookup(
        spark.sql("select md5('k5')").first()[0]).collect()]
    assert len(got) == 1 and got[0]["rev"] == "r5"
