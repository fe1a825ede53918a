"""Deterministic zero-sampling write exchange (round-4 review #5):
driver-side Murmur3 parity, exact partition placement, plan shape (no
range sampling on the merge path, compact still one exchange), and
merge/compact correctness under the new exchange."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import (
    EXACT_REPARTITION_MAX,
    LakeTable,
    _hash_reps,
    _murmur3_int,
    exact_partition_rep,
)

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def test_murmur3_parity_with_spark_hash(spark):
    """The driver-side Murmur3 must be bit-exact with F.hash on ints —
    the whole placement precomputation rests on it."""
    rows = spark.range(-500, 4000).select(
        F.col("id").cast("int").alias("i"),
        F.hash(F.col("id").cast("int")).alias("h"),
    ).collect()
    assert all(r["h"] == _murmur3_int(r["i"]) for r in rows)


def test_hash_reps_cover_all_residues():
    for n in (1, 2, 7, 8, 32, 64, 257):
        reps = _hash_reps(n)
        assert len(reps) == n
        assert [(_murmur3_int(x) % n + n) % n for x in reps] == list(range(n))


def test_exact_placement_and_evenness(spark):
    """repartition(n, exact_partition_rep(pid, n)) places dense pid p in
    partition p exactly — range partitioning's evenness without its
    sampling job."""
    for n in (3, 8, 17):
        df = spark.range(0, 50 * n).select((F.col("id") % n).cast("int").alias("pid"))
        got = (
            df.repartition(n, exact_partition_rep(F.col("pid"), n))
            .select("pid", F.spark_partition_id().alias("sp"))
            .distinct()
            .collect()
        )
        assert {(r["pid"], r["sp"]) for r in got} == {(p, p) for p in range(n)}


def test_write_exchange_plan_has_no_range_sampling(spark, tmp_path):
    """The merge write exchange must be a fixed-numPartitions hash
    repartition (REPARTITION_BY_NUM — AQE leaves it alone), never
    rangepartitioning: the range sampler re-executes the entire child
    plan once per batch, the dominant constant serial cost of a replay."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=16)
    df = spark.range(0, 100).select(
        F.concat(F.lit("r"), (F.col("id") % 5).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        F.lit("c0").alias("commit"), F.lit("py").alias("lang"),
        F.lit("x").alias("content"), F.col("id").alias("_gtid"),
        F.lit(0).alias("_seq"),
        F.pmod(F.xxhash64("repo", "path"), F.lit(16)).cast("int").alias("_bucket"),
    )
    plan = t._write_exchange(df, files_per_bucket=2)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    # evenness: 16 buckets x 2 salts = 32 cells over min(32, shuffle=8)
    # partitions -> exactly 4 cells per reducer
    out = t._write_exchange(df, files_per_bucket=2)
    sizes = out.groupBy(F.spark_partition_id().alias("sp")).count().collect()
    assert len(sizes) <= 8
    cells = (
        out.select(
            F.col("_bucket"),
            F.pmod(F.xxhash64("repo", "path", F.lit(7)), F.lit(2)).alias("_s"),
            F.spark_partition_id().alias("sp"))
        .distinct().collect()
    )
    per_part: dict = {}
    for r in cells:
        per_part.setdefault(r["sp"], set()).add((r["_bucket"], r["_s"]))
    assert all(len(v) <= 4 for v in per_part.values())


def test_merge_and_compact_correct_under_exact_exchange(spark, tmp_path):
    """End-to-end: MOR merges + compaction produce the LWW-correct state
    and compaction's plan keeps the single write exchange (the window
    runs inside the exchange's clustering — no second shuffle)."""
    from th2_listener_mysql_binlog_go_spark.operators.apply import (
        ApplyConfig,
        BatchApplier,
    )
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        synthetic_changestream,
    )
    from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

    stream = synthetic_changestream(spark, 4000, n_repos=12, n_paths=30,
                                    truncate_per_10k=0).cache()
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=8)
    ReplayRunner(spark, t, batch_span=1000,
                 config=ApplyConfig(merge_mode="mor", files_per_bucket=2)).run(stream)
    events = [r.asDict(recursive=True) for r in stream.collect()]
    expected = state_fingerprint(replay_oracle(events))
    assert df_fingerprint([r.asDict() for r in t.read().collect()]) == expected
    n_before = t.read().count()
    assert t.compact(files_per_bucket=2) > 0
    assert t.read().count() == n_before
    assert df_fingerprint([r.asDict() for r in t.read().collect()]) == expected
    # compaction idempotence survives the new exchange
    assert t.compact(files_per_bucket=2) == 0
    stream.unpersist()


def test_exact_repartition_fallback_threshold():
    assert EXACT_REPARTITION_MAX == 1024
    # reps for a large-but-allowed n stay computable fast
    reps = _hash_reps(1024)
    assert len(set(reps)) == 1024


def test_size_balanced_repartition_exact(spark):
    """multimodal's byte-balanced repartition keeps one pack per task
    under the exact exchange."""
    from th2_listener_mysql_binlog_go_spark.functions import multimodal as mm

    df = spark.range(0, 400).select(
        F.col("id").alias("media_id"),
        (F.col("id") % 97 + 10).alias("nbytes"),
    )
    out = mm.size_balanced_repartition(df, "nbytes", order_col="media_id",
                                       target_bytes=2000, chunk_span=50)
    sizes = (out.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").agg(F.sum("nbytes").alias("s")).collect())
    total = 400 * 10 + sum(i % 97 for i in range(400))
    n_packs = -(-total // 2000)
    assert len(sizes) == n_packs
    assert all(r["s"] <= 2000 + 106 for r in sizes)
