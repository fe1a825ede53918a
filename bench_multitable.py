"""Multi-table apply evidence: K observed tables must NOT cost K
sequential merge walls per batch. Replays the same 4-table change stream
through CatalogReplayRunner twice — sequential (table_parallelism=1,
pipeline_depth=1) vs parallel (pair staging + batch pipeline) — plus a
single-table baseline processing one table's share, and prints ONE JSON
line with the walls and the parallel speedup.

Env: MT_EVENTS (default 2_000_000), MT_BATCHES (4), SPARK_GRAFT_CPUS (32).
Run exclusively (see CLAUDE.md benchmarking notes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVENTS = int(os.environ.get("MT_EVENTS", "2000000"))
BATCHES = int(os.environ.get("MT_BATCHES", "4"))


def main() -> None:
    from pyspark.sql import functions as F

    from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
    from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog
    from th2_listener_mysql_binlog_go_spark.session import build_session
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        synthetic_changestream,
    )
    from th2_listener_mysql_binlog_go_spark.streaming.runner import CatalogReplayRunner

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = build_session(
        "cdc-multitable-bench", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf={
            "spark.local.dir": f"{shm}/spark-local-mtbench",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "12g",
        } if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    tables = [f"files{i}" for i in range(4)]
    src = os.path.join(shm or tempfile.gettempdir(), "mt-src")
    stream = synthetic_changestream(
        spark, EVENTS, n_repos=max(200, EVENTS // 5000), n_paths=2000,
        with_truncate=False, n_partitions=CPUS * 2,
    ).withColumn(
        "table_name",
        F.when(F.col("table_name") == "shadow_table", F.lit("shadow_table"))
        .otherwise(F.concat(F.lit("files"),
                            (F.abs(F.xxhash64("gtid", F.lit(99))) % 4).cast("string"))),
    )
    stream.write.mode("overwrite").parquet(src)
    stream = spark.read.parquet(src)
    schema = [("repo", "string"), ("path", "string"), ("commit", "string"),
              ("lang", "string"), ("content", "string")]
    span = max(EVENTS // BATCHES, 1)

    def run(observed: list[str], table_parallelism: int, depth: int) -> float:
        tmp = tempfile.mkdtemp(prefix="mtb_", dir=shm)
        cat = LakeCatalog.create(spark, os.path.join(tmp, "cat"))
        for t in observed:
            cat.create_table("repos", t, schema, ["repo", "path"], num_buckets=32)
        cfg = ApplyConfig(observed={"repos": observed}, files_per_bucket=2,
                          table_parallelism=table_parallelism)
        runner = CatalogReplayRunner(spark, cat, batch_span=span, config=cfg,
                                     pipeline_depth=depth)
        t0 = time.monotonic()
        runner.run(stream)
        dt = time.monotonic() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        return dt

    # warm-up (codegen/JIT) excluded from all timings
    run([tables[0]], 1, 1)

    single = run([tables[0]], 1, 1)
    seq4 = run(tables, 1, 1)
    par4 = run(tables, 4, 3)

    print(json.dumps({
        "metric": "cdc_multitable_parallel_apply",
        "events": EVENTS, "batches": BATCHES, "cpus": CPUS, "tables": 4,
        "single_table_sec": round(single, 2),
        "four_tables_sequential_sec": round(seq4, 2),
        "four_tables_parallel_sec": round(par4, 2),
        "parallel_speedup_vs_sequential": round(seq4 / par4, 2),
        "parallel_vs_4x_single": round(par4 / (4 * single), 2),
    }))
    spark.stop()
    shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
