"""Matview maintenance evidence: incremental refresh O(changes) vs full
recompute O(table) on the same source, same session, interleaved cycles.

Not part of bench.py's driver contract — run standalone on an exclusive
machine:  python bench_matview.py   (env: MATVIEW_ROWS, MATVIEW_BATCH,
MATVIEW_CYCLES, SPARK_GRAFT_CPUS). Prints ONE JSON line.
"""
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.session import build_session
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.plans.matview import IncrementalAggView

ROWS = int(os.environ.get("MATVIEW_ROWS", "2000000"))
BATCH = int(os.environ.get("MATVIEW_BATCH", "2000"))
CYCLES = int(os.environ.get("MATVIEW_CYCLES", "3"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _bulk(spark, n, gtid0, op="INSERT"):
    # deterministic keyed rows: ~n distinct (repo, path) keys, 7 langs.
    # UPDATE batches salt the commit with the gtid base so the rewrite
    # actually changes a value column — net-semantics changes() drops
    # identical rewrites, which would turn the refresh into a no-op.
    commit_seed = (F.col("id").cast("string") if op == "INSERT"
                   else F.concat(F.col("id").cast("string"),
                                 F.lit(f"u{gtid0}")))
    return (spark.range(n)
            .select(
                F.concat(F.lit("org"), (F.col("id") % 97).cast("string")).alias("repo"),
                F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
                F.md5(commit_seed).alias("commit"),
                F.element_at(F.array(*[F.lit(x) for x in
                             ["py", "go", "java", "ts", "rs", "sql", "md"]]),
                             ((F.col("id") % 7) + 1).cast("int")).alias("lang"),
                F.repeat(F.md5(F.col("id").cast("string")), 4).alias("content"),
                F.lit(op).alias("_op"),
                (F.lit(gtid0) + F.col("id")).cast("long").alias("_gtid"),
            ))


def main() -> None:
    spark = build_session(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_matview_", dir="/dev/shm")
    try:
        t = LakeTable.create(
            spark, os.path.join(tmp, "src"),
            [("repo", "string"), ("path", "string"), ("commit", "string"),
             ("lang", "string"), ("content", "string")],
            key_cols=["repo", "path"], num_buckets=32)
        t.merge(_bulk(spark, ROWS, 0), batch_id=1, mode="mor")
        t.compact()
        view = IncrementalAggView.create(
            spark, t, os.path.join(tmp, "v"), dims=["lang"],
            aggs={"n_files": ("count",),
                  "total_len": ("sum", "length(content)")},
            num_buckets=4)

        bucket = F.pmod(F.xxhash64("repo", "path"), F.lit(32)).cast("int")

        def _local_batch(n, gtid0):
            # UPDATEs confined to source buckets {0, 1} — the localized
            # CDC-burst shape where changes() prunes the old-state read
            base = (_bulk(spark, ROWS, 0).filter(bucket < 2).limit(n)
                    .drop("_gtid"))
            return (base.withColumn("_op", F.lit("UPDATE"))
                    .withColumn("_gtid",
                                (F.lit(gtid0)
                                 + F.monotonically_increasing_id() % n)
                                .cast("long"))
                    .withColumn("commit", F.lit("upd")))

        uni_s, loc_s, rebuild_s = [], [], []
        gtid = ROWS
        bid = 1
        for _ in range(CYCLES):
            # uniform small batch (touches every bucket) -> refresh
            bid += 1
            t.merge(_bulk(spark, BATCH, gtid, op="UPDATE"), batch_id=bid,
                    mode="mor")
            gtid += BATCH
            w0 = time.monotonic()
            assert not view.refresh().get("skipped")
            uni_s.append(round(time.monotonic() - w0, 3))
            # bucket-localized batch -> refresh (old-state read prunes)
            bid += 1
            t.merge(_local_batch(BATCH, gtid), batch_id=bid, mode="mor")
            gtid += BATCH
            w0 = time.monotonic()
            assert not view.refresh().get("skipped")
            loc_s.append(round(time.monotonic() - w0, 3))
            # same-size batch -> full recompute (rebuild)
            bid += 1
            t.merge(_bulk(spark, BATCH, gtid, op="UPDATE"), batch_id=bid,
                    mode="mor")
            gtid += BATCH
            w0 = time.monotonic()
            assert view.rebuild().get("rebuilt")
            rebuild_s.append(round(time.monotonic() - w0, 3))

        groups = view.read().count()
        out = {
            "metric": "matview_refresh_vs_rebuild",
            "unit": "sec",
            "rows": ROWS, "batch": BATCH, "cycles": CYCLES, "cpus": CPUS,
            "groups": int(groups),
            "refresh_uniform_runs_sec": uni_s,
            "refresh_localized_runs_sec": loc_s,
            "rebuild_runs_sec": rebuild_s,
            "refresh_uniform_best_sec": min(uni_s),
            "refresh_localized_best_sec": min(loc_s),
            "rebuild_best_sec": min(rebuild_s),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
