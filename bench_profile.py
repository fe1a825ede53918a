"""Steady-state headline profile (guide §1): warmup + 3 rolls of the
bench.py headline shape with the event log on, each roll's run/compact
labeled via setJobDescription. NOT the driver's bench — bench.py stays
the frozen contract; numbers from here are cited in OPTIMIZATION_r06.md
(continuation-session verification). Parse the event log under
$PROF_EVENT_DIR for per-stage task metrics (the per-batch staged writes
run on pipeline worker threads, so window jobs by submission order, not
by description).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PROF_EVENT_DIR."""
import json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from th2_listener_mysql_binlog_go_spark.session import build_session
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner
from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig

evdir = os.environ.get("PROF_EVENT_DIR", "/tmp/spark-events-prof")
shutil.rmtree(evdir, ignore_errors=True)
os.makedirs(evdir, exist_ok=True)
shm = "/dev/shm"
spark = build_session(
    "cdc-prof", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32),
    extra_conf={
        "spark.local.dir": f"{shm}/spark-local-bench",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "12g",
        "spark.shuffle.compress": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
    })
spark.sparkContext.setLogLevel("ERROR")

n_events = int(os.environ.get("CDC_BENCH_EVENTS", "4000000"))
stream = synthetic_changestream(
    spark, n_events, n_repos=max(200, n_events // 5000), n_paths=2000,
    with_truncate=False, n_partitions=CPUS * 2).persist()
stream.count()

tmp = tempfile.mkdtemp(prefix="cdc_prof_", dir=shm)
SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
warm = LakeTable.create(spark, os.path.join(tmp, "w"), SCHEMA,
                        key_cols=["repo", "path"], num_buckets=16)
ReplayRunner(spark, warm, batch_span=10_000).run(
    synthetic_changestream(spark, 20_000, with_truncate=False))
warm.compact()
shutil.rmtree(os.path.join(tmp, "w"), ignore_errors=True)

windows = []
for i in range(3):
    tdir = os.path.join(tmp, f"t{i}")
    table = LakeTable.create(spark, tdir, SCHEMA, key_cols=["repo", "path"],
                             num_buckets=64)
    runner = ReplayRunner(spark, table, batch_span=max(n_events // 8, 1),
                          config=ApplyConfig(files_per_bucket=4),
                          pipeline_depth=3)
    spark.sparkContext.setJobDescription(f"roll{i}-run")
    t0 = time.monotonic()
    runner.run(stream)
    t1 = time.monotonic()
    spark.sparkContext.setJobDescription(f"roll{i}-compact")
    table.compact(files_per_bucket=4)
    t2 = time.monotonic()
    spark.sparkContext.setJobDescription(None)
    windows.append({"roll": i, "run_s": round(t1 - t0, 3),
                    "compact_s": round(t2 - t1, 3),
                    "t0": t0, "t1": t1, "t2": t2})
    shutil.rmtree(tdir, ignore_errors=True)
print(json.dumps(windows))
stream.unpersist()
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
# leave event log in evdir for offline parse
