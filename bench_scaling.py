"""Scaling-efficiency evidence: the same CDC apply job at two parallelism
levels (local[N] vs local[4N]) on identical input — the in-sandbox stand-in
for the north rule's N vs 4N executor-cluster criterion (BASELINE.md).

Each level runs in its own subprocess (fresh JVM, no warm-cache bleed).
Prints one JSON line:
{"throughput_n": ..., "throughput_4n": ..., "scaling_efficiency": ...}

Efficiency = (throughput_4N / throughput_N) / 4. Events count is sized so
the run is compute-bound, not scheduling-bound (SCALING_EVENTS env).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("SCALING_N", "8"))
EVENTS = int(os.environ.get("SCALING_EVENTS", "4000000"))

_CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, __REPO__)
cores = int(sys.argv[1]); n_events = int(sys.argv[2])
from th2_listener_mysql_binlog_go_spark.session import build_session
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

# shuffle + table on tmpfs: a single box serializes on one disk where a
# cluster has per-executor NVMe — RAM-backed local dirs restore the
# per-core I/O parallelism the cluster would have
local_dir = "/dev/shm/spark-local-%d" % cores
spark = build_session("scaling-%d" % cores, master="local[%d]" % cores,
                      shuffle_partitions=max(cores * 2, 16),
                      extra_conf={
                          "spark.local.dir": local_dir,
                          # throughput-batch workload: ParallelGC beats G1 here
                          "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
                      })
spark.sparkContext.setLogLevel("ERROR")
stream = synthetic_changestream(spark, n_events, n_repos=max(200, n_events // 5000),
                                n_paths=2000, n_partitions=cores * 4).persist()
stream.count()
tmp = tempfile.mkdtemp(prefix="scal_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
table = LakeTable.create(spark, os.path.join(tmp, "t"),
    [("repo", "string"), ("path", "string"), ("commit", "string"),
     ("lang", "string"), ("content", "string")],
    key_cols=["repo", "path"], num_buckets=64)
runner = ReplayRunner(spark, table, batch_span=max(n_events // 4, 1))
t0 = time.monotonic()
runner.run(stream)
dt = time.monotonic() - t0
print(json.dumps({"cores": cores, "sec": dt, "events_per_sec": n_events / dt}))
spark.stop()
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
    lo = run_level(N)
    hi = run_level(4 * N)
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4.0
    print(json.dumps({
        "metric": "cdc_apply_scaling_efficiency",
        "events": EVENTS,
        "n_cores": N, "throughput_n": round(lo["events_per_sec"], 1),
        "n4_cores": 4 * N, "throughput_4n": round(hi["events_per_sec"], 1),
        "sec_n": round(lo["sec"], 2), "sec_4n": round(hi["sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
