"""Isolation bench (guide §1.4): per-phase breakdown of the replay-family
query cost and the headline apply, with noop-sink timing so the compute is
measured without the collect/count sink. NOT the driver's bench — bench.py
stays the frozen measurement contract; numbers here are cited in
OPTIMIZATION_r06.md only.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py),
ISO_PHASES (comma list: query,apply — default query).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, out, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    r = fn()
    out[label] = round(time.monotonic() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return r


def main() -> None:
    from pyspark.sql import functions as F

    from th2_listener_mysql_binlog_go_spark.session import build_session
    from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        derived_changestream, synthetic_changestream, to_change_schema)
    from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner
    from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = build_session(
        "cdc-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf={
            "spark.local.dir": f"{shm}/spark-local-bench",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "12g",
        } if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    phases = os.environ.get("ISO_PHASES", "query").split(",")
    out: dict = {}

    if "query" in phases:
        # --- replay-family query breakdown (cdc_replay_final_state shape) ---
        t: dict = {}
        flat = derived_changestream(spark, SF_DIR)
        nested = to_change_schema(flat)
        timed("derive+noop", lambda: noop(nested), t, spark)
        b = timed("bounds_agg", lambda: flat.agg(
            F.min("gtid").alias("lo"), F.max("gtid").alias("hi")).collect()[0], t, spark)
        span = max(1, (int(b["hi"]) - int(b["lo"]) + 1) // 8)
        tmp = tempfile.mkdtemp(prefix="iso_replay_", dir=shm)
        table = timed("create", lambda: LakeTable.create(
            spark, os.path.join(tmp, "t"),
            [("repo", "string"), ("path", "string"), ("commit", "string"),
             ("lang", "string"), ("content", "string")],
            key_cols=["repo", "path"], num_buckets=16), t, spark)
        runner = ReplayRunner(spark, table, batch_span=span)
        timed("runner.run(8 batches)", lambda: runner.run(nested), t, spark)
        timed("read+count", lambda: table.read().count(), t, spark)
        shutil.rmtree(tmp, ignore_errors=True)
        out["query_replay_final_state"] = t

    if "apply" in phases:
        # --- headline apply breakdown (bench.py shape, 1 roll) --------------
        t = {}
        n_events_dir = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        n_events = int(os.environ.get("CDC_BENCH_EVENTS",
                                      str(max(n_events_dir * 40, 100_000))))
        stream = synthetic_changestream(
            spark, n_events, n_repos=max(200, n_events // 5000), n_paths=2000,
            with_truncate=False, n_partitions=CPUS * 2).persist()
        stream.count()
        tmp = tempfile.mkdtemp(prefix="iso_apply_", dir=shm)
        table = LakeTable.create(
            spark, os.path.join(tmp, "t"),
            [("repo", "string"), ("path", "string"), ("commit", "string"),
             ("lang", "string"), ("content", "string")],
            key_cols=["repo", "path"], num_buckets=64)
        runner = ReplayRunner(spark, table, batch_span=max(n_events // 8, 1),
                              config=ApplyConfig(files_per_bucket=4),
                              pipeline_depth=3)
        timed("bounds", lambda: runner._bounds(stream), t, spark)
        timed("run(8 batches, depth3)", lambda: runner.run(stream), t, spark)
        timed("compact", lambda: table.compact(files_per_bucket=4), t, spark)
        timed("read+count", lambda: table.read().count(), t, spark)
        stream.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
        out["headline_apply"] = t

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
