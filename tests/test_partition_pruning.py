"""Per-batch partition pruning on a gtid-partitioned archive (round-3
review #5): batch k's scan must read only its span's files — the property
that keeps per-batch cost O(batch) on a 10^10-event archive."""

import os

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream,
    write_gtid_partitioned,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _scan_files_read(df) -> int:
    """numFiles metric of the (single) file scan in df's executed plan —
    the count AFTER partition pruning, unlike inputFiles(). Executes THAT
    plan instance (df.count() would build a fresh one whose metrics we
    can't see)."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()  # RDD count: runs this exact plan, no driver data
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        metrics = node.metrics()
        if metrics.contains("numFiles"):
            total += metrics.apply("numFiles").value()
    return int(total)


def _archive_files(src: str) -> dict[int, int]:
    """{gtid_span: parquet file count} from the hive layout on disk."""
    out: dict[int, int] = {}
    for d in os.listdir(src):
        if d.startswith("gtid_span="):
            n = sum(1 for f in os.listdir(os.path.join(src, d))
                    if f.endswith(".parquet"))
            out[int(d.split("=", 1)[1])] = n
    return out


def test_batch_scan_prunes_to_its_partitions(spark, tmp_path):
    src = str(tmp_path / "archive")
    stream = synthetic_changestream(spark, 8000, n_repos=20, n_paths=40,
                                    truncate_per_10k=0, n_partitions=8)
    write_gtid_partitioned(stream, src, partition_span=1000)
    per_span = _archive_files(src)
    assert len(per_span) == 8                      # spans 0..7 on disk
    total_files = sum(per_span.values())

    archive = spark.read.parquet(src)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=4)
    runner = ReplayRunner(spark, t, batch_span=1000,
                          partition_col="gtid_span", partition_span=1000)

    # batch 3's slice reads ONLY span 3's files
    b3 = runner.batch_df(archive, 3)
    files_read = _scan_files_read(b3.select("gtid"))
    assert files_read == per_span[3]
    assert files_read < total_files

    # the plan itself shows the partition filter reaching the scan
    plan = b3._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "gtid_span" in plan.split("PartitionFilters", 1)[1][:200]

    # WITHOUT the declared partitioning, the same gtid range scans the
    # whole archive (no gtid->dir transitivity) — the contrast that makes
    # the pruning real, not incidental
    plain = ReplayRunner(spark, t, batch_span=1000)
    assert _scan_files_read(plain.batch_df(archive, 3).select("gtid")) == total_files

    # a batch whose span straddles two partitions reads exactly both
    wide = ReplayRunner(spark, t, batch_span=1500,
                        partition_col="gtid_span", partition_span=1000)
    b2 = wide.batch_df(archive, 2)                  # gtids [3000, 4500)
    assert _scan_files_read(b2.select("gtid")) == per_span[3] + per_span[4]


def test_partitioned_replay_matches_oracle(spark, tmp_path):
    """End-to-end replay off the partitioned archive (pruned per-batch
    scans, including the windowed DDL prescan) converges to the oracle."""
    src = str(tmp_path / "archive")
    stream = synthetic_changestream(spark, 5000, n_repos=30, n_paths=50,
                                    truncate_per_10k=20)
    write_gtid_partitioned(stream, src, partition_span=500)
    archive = spark.read.parquet(src)

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=8)
    runner = ReplayRunner(spark, t, batch_span=1000, pipeline_depth=2,
                          config=ApplyConfig(files_per_bucket=2),
                          partition_col="gtid_span", partition_span=500)
    m = runner.run(archive)
    assert m["batches"] == 5

    events = [
        {"gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
         "before": r["before"].asDict() if r["before"] else None,
         "after": r["after"].asDict() if r["after"] else None}
        for r in stream.collect()
    ]
    expected = state_fingerprint(replay_oracle(events))
    got = df_fingerprint([r.asDict() for r in t.read().collect()])
    assert got == expected


def test_bounds_scan_prunes_to_extreme_partitions(spark, tmp_path):
    """run()'s opening min/max-gtid discovery must not rescan the whole
    archive when partitioning is declared: partition values come from one
    root-level dir listing (O(partitions), file-count independent) and
    only the two extreme partitions are scanned for exact gtids."""
    src = str(tmp_path / "archive")
    stream = synthetic_changestream(spark, 8000, n_repos=20, n_paths=40,
                                    truncate_per_10k=0, n_partitions=8)
    write_gtid_partitioned(stream, src, partition_span=1000)
    per_span = _archive_files(src)
    archive = spark.read.parquet(src)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=4)
    runner = ReplayRunner(spark, t, batch_span=1000,
                          partition_col="gtid_span", partition_span=1000,
                          archive_root=src)
    # no full file enumeration anywhere on the bounds path (round-4 review:
    # inputFiles() shipped EVERY archive file path through the driver)
    archive.inputFiles = lambda: (_ for _ in ()).throw(
        AssertionError("bounds must not enumerate archive files"))
    assert runner._listed_extreme_partitions() == (0, 7)
    b = runner._bounds(archive)
    assert (b["lo"], b["hi"]) == (0, 7999)
    # the pruned bounds plan reads only the extreme partitions' files
    pred = F.col("gtid_span").isin(0, 7)
    files_read = _scan_files_read(archive.filter(pred).select("gtid"))
    assert files_read == per_span[0] + per_span[7] < sum(per_span.values())
    # un-declared: exact same answer, full-scan path
    b2 = ReplayRunner(spark, t, batch_span=1000)._bounds(archive)
    assert (b2["lo"], b2["hi"]) == (0, 7999)


def test_bounds_correct_on_filtered_stream(spark, tmp_path):
    """_bounds accepts ANY DataFrame, including a pre-filtered archive read
    (bench_scaling's warm-up does exactly that). A filter that empties an
    extreme partition must NOT skew lo/hi to the other extreme's values —
    the silently-skipped-middle-batches hazard of round-4 advice #1."""
    src = str(tmp_path / "archive")
    stream = synthetic_changestream(spark, 8000, n_repos=20, n_paths=40,
                                    truncate_per_10k=0, n_partitions=8)
    write_gtid_partitioned(stream, src, partition_span=1000)
    archive = spark.read.parquet(src)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=4)
    for root in (src, None):  # listing path AND partition-col-agg path
        runner = ReplayRunner(spark, t, batch_span=1000,
                              partition_col="gtid_span", partition_span=1000,
                              archive_root=root)
        # filter keeps both extremes partially: per-partition split still exact
        b = runner._bounds(archive.filter("gtid >= 500 and gtid < 7500"))
        assert (b["lo"], b["hi"]) == (500, 7499)
        # filter EMPTIES the low extreme (and more): old code returned
        # lo = max-partition's min, silently skipping every middle batch
        b = runner._bounds(archive.filter("gtid >= 2500"))
        assert (b["lo"], b["hi"]) == (2500, 7999)
        # filter empties the high extreme
        b = runner._bounds(archive.filter("gtid < 5500"))
        assert (b["lo"], b["hi"]) == (0, 5499)
        # filter empties everything
        b = runner._bounds(archive.filter("gtid < 0"))
        assert b["lo"] is None
