"""Host-scaling CALIBRATION: the ceiling a perfectly-parallel Spark job
reaches on this machine, measured with the engine's own resource profile.

The engine's 2→8 scaling (BENCH_SCALING.json) is bounded by three things:
(1) engine serialization (driver sections, commit ordering), (2) the Spark
platform's per-job overhead, and (3) the host's per-thread throughput
degradation under load — SMT pairing, shared memory bandwidth, shared
tmpfs. A pure-ALU probe (BASELINE.md round 2) isolates only the ALU part
of (3); the engine's actual work is parquet decode + hash + parquet
encode + shuffle, which is MEMORY-BANDWIDTH-bound, so its ceiling must be
measured with the same resource mix.

Two calibration jobs over the SAME gtid-partitioned archive the scaling
bench replays, at the same two parallelism levels:

  * ``map_only``  — read archive, project all columns + one xxhash64,
    write parquet. Zero shuffles, zero driver-side sections beyond one
    job submission: the embarrassingly-parallel ceiling of decode/encode
    work on this host. NO engine code runs.
  * ``one_shuffle`` — same, plus a single hash repartition on the key
    column before the write: adds one exchange, the minimal shuffle-
    fabric cost any keyed CDC apply must pay at least once.

Efficiency = (throughput_4N / throughput_N) / 4, best-of-REPEATS
interleaved, each level in its own subprocess (fresh JVM) — the exact
protocol of bench_scaling.py. Interpretation: the ENGINE-attributable
scaling loss is engine_eff / calib_eff; an engine at ~1.0 of the
one_shuffle calibration adds no serialization beyond what this host +
Spark platform impose on ideal work of the same shape.

Env: SCALING_N (default 2), SCALING_EVENTS (12M), SCALING_REPEATS (3).
Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("SCALING_N", "2"))
EVENTS = int(os.environ.get("SCALING_EVENTS", "12000000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, __REPO__)
cores = int(sys.argv[1]); n_events = int(sys.argv[2])
from pyspark.sql import functions as F
from th2_listener_mysql_binlog_go_spark.session import build_session
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream, write_gtid_partitioned)

local_dir = "/dev/shm/spark-calib-%d" % cores
spark = build_session("calib-%d" % cores, master="local[%d]" % cores,
                      shuffle_partitions=max(cores * 2, 16),
                      extra_conf={
                          "spark.local.dir": local_dir,
                          "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
                          "spark.memory.offHeap.enabled": "true",
                          "spark.memory.offHeap.size": "12g",
                          "spark.shuffle.compress": "true",
                          "spark.shuffle.spill.compress": "true",
                      })
spark.sparkContext.setLogLevel("ERROR")
# identical archive layout to bench_scaling.py (4 batches x 4 spans)
src = "/dev/shm/calib-src-%d" % cores
p_span = max(n_events // 16, 1)
write_gtid_partitioned(
    synthetic_changestream(spark, n_events, n_repos=max(200, n_events // 5000),
                           n_paths=2000, with_truncate=False, n_partitions=cores * 4),
    src, partition_span=p_span)
stream = spark.read.parquet(src)
cols = stream.columns

out1 = "/dev/shm/calib-out1-%d" % cores
out2 = "/dev/shm/calib-out2-%d" % cores

# warm-up: compile codegen + JIT for both plan shapes (excluded), tiny slice
stream.filter("gtid < 20000").withColumn("_h", F.xxhash64(*cols)) \
    .write.mode("overwrite").parquet(out1)
stream.filter("gtid < 20000").repartition(max(cores * 2, 16), "gtid") \
    .withColumn("_h", F.xxhash64(*cols)).write.mode("overwrite").parquet(out2)

t0 = time.monotonic()
stream.withColumn("_h", F.xxhash64(*cols)).write.mode("overwrite").parquet(out1)
t_map = time.monotonic() - t0

t0 = time.monotonic()
stream.repartition(max(cores * 2, 16), "gtid") \
    .withColumn("_h", F.xxhash64(*cols)).write.mode("overwrite").parquet(out2)
t_shuf = time.monotonic() - t0

print(json.dumps({"cores": cores, "t_map": round(t_map, 2),
                  "t_shuffle": round(t_shuf, 2)}))
spark.stop()
for d in (src, out1, out2, local_dir):
    shutil.rmtree(d, ignore_errors=True)
"""


def run_level(cores: int) -> dict:
    code = _CHILD.replace("__REPO__", repr(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(EVENTS)],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    runs_lo, runs_hi = [], []
    for _ in range(REPEATS):  # interleaved, like bench_scaling.py
        runs_lo.append(run_level(N))
        runs_hi.append(run_level(4 * N))
    res = {"metric": "host_scaling_calibration", "events": EVENTS,
           "n_cores": N, "n4_cores": 4 * N}
    for key, field in (("map_only", "t_map"), ("one_shuffle", "t_shuffle")):
        lo = min(r[field] for r in runs_lo)
        hi = min(r[field] for r in runs_hi)
        res[key] = {
            "sec_n": lo, "sec_4n": hi,
            "efficiency": round((lo / hi) / 4.0, 3),
            "all_runs": {"n": [r[field] for r in runs_lo],
                         "n4": [r[field] for r in runs_hi]},
        }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
