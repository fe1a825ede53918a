"""The north rule's launch surface: the engine driven via real
``spark-submit --py-files <pkg.zip>`` child processes — create, partial
replay (simulated crash), resume in a SECOND process, compact, show —
with the final state checked against the pure-python oracle.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "th2_listener_mysql_binlog_go_spark"

RUNNER = """
import sys
from th2_listener_mysql_binlog_go_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


def _zip_pkg(dest: str) -> str:
    zpath = os.path.join(dest, "cdc_engine.zip")
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(src):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath: str, script: str, *args: str) -> dict:
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    out = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zpath, script, *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_spark_submit_replay_resume_compact(spark, tmp_path):
    zpath = _zip_pkg(str(tmp_path))
    script = str(tmp_path / "run_cdc.py")
    with open(script, "w") as f:
        f.write(RUNNER)

    src = str(tmp_path / "events")
    stream = synthetic_changestream(spark, 3000, n_repos=30, n_paths=60,
                                    truncate_per_10k=10)
    stream.write.parquet(src)
    table_dir = str(tmp_path / "t")

    created = _submit(
        zpath, script, "create", "--table", table_dir,
        "--schema", "repo string, path string, commit string, lang string, content string",
        "--keys", "repo,path", "--num-buckets", "8")
    assert created["num_buckets"] == 8

    # partial replay = simulated crash after 2 of 6 batches
    m1 = _submit(zpath, script, "replay", "--table", table_dir,
                 "--source", src, "--batch-span", "500",
                 "--pipeline-depth", "2", "--max-batches", "2")
    assert m1["batches"] == 2

    # resume from the table-as-checkpoint in a fresh process
    m2 = _submit(zpath, script, "replay", "--table", table_dir,
                 "--source", src, "--batch-span", "500", "--pipeline-depth", "2")
    assert m2["batches"] == 4 and m2["watermark_gtid"] == 2999

    compacted = _submit(zpath, script, "compact", "--table", table_dir,
                        "--files-per-bucket", "2")
    assert compacted["compacted_buckets"] >= 1

    shown = _submit(zpath, script, "show", "--table", table_dir)
    assert shown["properties"]["watermark_gtid"] == "2999"

    # tag surface: pin head, visible to a later process, then drop it
    tagged = _submit(zpath, script, "tag", "--table", table_dir, "--name", "audit")
    assert tagged["tags"]["audit"] == tagged["version"]
    dropped = _submit(zpath, script, "tag", "--table", table_dir,
                      "--name", "audit", "--delete")
    assert dropped["deleted"] is True and dropped["tags"] == {}

    expect = replay_oracle([r.asDict(recursive=True) for r in stream.collect()])
    got = df_fingerprint([r.asDict()
                          for r in LakeTable.load(spark, table_dir).read().collect()])
    assert got == state_fingerprint(expect)

    # Structured Streaming surface via the same CLI: drain the source into
    # a fresh table with availableNow, converge to the identical state
    from th2_listener_mysql_binlog_go_spark.sources.changestream import CHANGE_SCHEMA

    t2_dir = str(tmp_path / "t2")
    _submit(zpath, script, "create", "--table", t2_dir,
            "--schema", "repo string, path string, commit string, lang string, content string",
            "--keys", "repo,path", "--num-buckets", "8")
    m3 = _submit(zpath, script, "stream", "--table", t2_dir,
                 "--source", src, "--checkpoint", str(tmp_path / "ckpt"),
                 "--schema", CHANGE_SCHEMA)
    assert m3["watermark_gtid"] == 2999
    got2 = df_fingerprint([r.asDict()
                           for r in LakeTable.load(spark, t2_dir).read().collect()])
    assert got2 == state_fingerprint(expect)
    shutil.rmtree(str(tmp_path / "events"), ignore_errors=True)


def test_spark_submit_catalog_replay_resume(spark, tmp_path):
    """Cross-process catalog crash-resume through the O(1) PROGRESS
    channel: catalog + tables created via the CLI, partial catalog-replay
    in one spark-submit process (simulated crash), a SECOND process
    resumes to completion; per-table states match the oracle and the
    per-batch progress minted zero registry versions."""
    from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog

    zpath = _zip_pkg(str(tmp_path))
    script = str(tmp_path / "run_cdc.py")
    with open(script, "w") as f:
        f.write(RUNNER)

    src = str(tmp_path / "events")
    stream = synthetic_changestream(spark, 2000, n_repos=20, n_paths=40,
                                    truncate_per_10k=0)
    stream.repartition(4).write.parquet(src)
    croot = str(tmp_path / "cat")
    schema_str = "repo string, path string, commit string, lang string, content string"

    _submit(zpath, script, "catalog-create", "--catalog", croot)
    for name in ("repos.files", "repos.files2"):
        m = _submit(zpath, script, "catalog-create-table", "--catalog", croot,
                    "--name", name, "--schema", schema_str,
                    "--keys", "repo,path", "--num-buckets", "4")
    assert m["tables"] == ["repos.files", "repos.files2"]
    reg_before = sorted(f for f in os.listdir(os.path.join(croot, "_catalog"))
                        if f.startswith("r") and f.endswith(".json"))

    args = ["--catalog", croot, "--source", src, "--batch-span", "500",
            "--observed", "repos.files,repos.files2", "--pipeline-depth", "2"]
    m1 = _submit(zpath, script, "catalog-replay", *args, "--max-batches", "2")
    assert m1["batches"] == 2
    m2 = _submit(zpath, script, "catalog-replay", *args)   # fresh process resumes
    assert m1["batches"] + m2["batches"] == 4
    # batch progress went through PROGRESS, not registry versions
    reg_after = sorted(f for f in os.listdir(os.path.join(croot, "_catalog"))
                       if f.startswith("r") and f.endswith(".json"))
    assert reg_after == reg_before
    assert os.path.exists(os.path.join(croot, "_catalog", "PROGRESS"))

    events = [
        {"gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
         "before": r["before"].asDict() if r["before"] else None,
         "after": r["after"].asDict() if r["after"] else None}
        for r in stream.collect()
    ]
    cat = LakeCatalog.load(spark, croot)
    for t in ("files", "files2"):
        expected = state_fingerprint(replay_oracle(events, observed_tables={t}))
        got = df_fingerprint(
            [r.asDict() for r in cat.get("repos", t).read().collect()])
        assert got == expected, t


def test_spark_submit_view_lifecycle(spark, tmp_path):
    """Materialized-view surface as real spark-submit child processes:
    create over a replayed table, advance the source in another process,
    refresh in a THIRD process (watermark persisted across processes),
    and the shown groups match a recompute."""
    from pyspark.sql import functions as F

    zpath = _zip_pkg(str(tmp_path))
    script = str(tmp_path / "run_cdc.py")
    with open(script, "w") as f:
        f.write(RUNNER)

    src = str(tmp_path / "events")
    stream = synthetic_changestream(spark, 1500, n_repos=20, n_paths=40,
                                    truncate_per_10k=0)
    stream.write.parquet(src)
    table_dir = str(tmp_path / "t")
    view_dir = str(tmp_path / "view")

    _submit(zpath, script, "create", "--table", table_dir,
            "--schema", "repo string, path string, commit string, lang string, content string",
            "--keys", "repo,path", "--num-buckets", "8")
    _submit(zpath, script, "replay", "--table", table_dir,
            "--source", src, "--batch-span", "500", "--max-batches", "1")
    created = _submit(
        zpath, script, "view-create", "--source", table_dir,
        "--view", view_dir, "--dims", "lang",
        "--agg", "n_files=count", "--agg", "total_len=sum:length(content)",
        "--num-buckets", "4")
    assert created["groups"] > 0

    _submit(zpath, script, "replay", "--table", table_dir,
            "--source", src, "--batch-span", "500")
    refreshed = _submit(zpath, script, "view-refresh",
                        "--source", table_dir, "--view", view_dir)
    assert refreshed["to_version"] > refreshed["from_version"]
    again = _submit(zpath, script, "view-refresh",
                    "--source", table_dir, "--view", view_dir)
    assert again["skipped"] is True

    shown = _submit(zpath, script, "view-show", "--source", table_dir,
                    "--view", view_dir, "--limit", "100")
    got = {r["lang"]: (r["n_files"], r["total_len"]) for r in shown["rows"]}
    want = {r["lang"]: (r["n"], r["s"])
            for r in LakeTable.load(spark, table_dir).read()
            .groupBy("lang").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("content")).cast("bigint").alias("s")).collect()}
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_spark_submit_handoff_and_key_history(spark, tmp_path):
    """The round-5 user journey via real spark-submit child processes:
    archive backfill (replay), handoff to the streaming tail
    (--resume-from-table pins the epoch base + gtid floor), then the
    per-key audit read (key-history) over the combined history."""
    zpath = _zip_pkg(str(tmp_path))
    script = str(tmp_path / "run_cdc.py")
    with open(script, "w") as f:
        f.write(RUNNER)

    full = synthetic_changestream(spark, 2000, n_repos=10, n_paths=20,
                                  truncate_per_10k=0)
    archive = str(tmp_path / "archive")
    live = str(tmp_path / "live")
    full.filter("gtid < 1200").repartition(2).write.parquet(archive)
    full.filter("gtid >= 1000").coalesce(1).write.parquet(live)

    table_dir = str(tmp_path / "t")
    schema = "repo string, path string, commit string, lang string, content string"
    _submit(zpath, script, "create", "--table", table_dir,
            "--schema", schema, "--keys", "repo,path", "--num-buckets", "4")
    _submit(zpath, script, "replay", "--table", table_dir,
            "--source", archive, "--batch-span", "300")

    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        CHANGE_SCHEMA,
    )
    m = _submit(zpath, script, "stream", "--table", table_dir,
                "--source", live, "--checkpoint", str(tmp_path / "ckpt"),
                "--schema", CHANGE_SCHEMA, "--max-files-per-trigger", "1",
                "--resume-from-table")
    assert m["watermark_gtid"] == 1999
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "handoff.json"))

    expected = state_fingerprint(replay_oracle([
        {"gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
         "before": r["before"].asDict() if r["before"] else None,
         "after": r["after"].asDict() if r["after"] else None}
        for r in full.collect()]))
    got = df_fingerprint([r.asDict() for r in
                          LakeTable.load(spark, table_dir).read().collect()])
    assert got == expected

    # per-key audit over the combined (backfill + streamed) history
    cur = LakeTable.load(spark, table_dir).read().limit(1).collect()[0]
    h = _submit(zpath, script, "key-history", "--table", table_dir,
                "--values", f"{cur['repo']},{cur['path']}")
    events = h["events"]
    assert events and events[-1]["_is_current"]
    gtids = [e["_gtid"] for e in events]
    assert gtids == sorted(gtids)


def test_spark_submit_dedup_index_lifecycle(spark, tmp_path):
    """Dedup-index surface as real spark-submit child processes: build
    over a replayed table, advance the source + refresh in later
    processes (watermark persisted), then match a candidate batch whose
    clone of an indexed document must surface."""
    zpath = _zip_pkg(str(tmp_path))
    script = str(tmp_path / "run_cdc.py")
    with open(script, "w") as f:
        f.write(RUNNER)

    src = str(tmp_path / "events")
    synthetic_changestream(spark, 1200, n_repos=15, n_paths=30,
                           truncate_per_10k=0).write.parquet(src)
    table_dir = str(tmp_path / "t")
    idx_dir = str(tmp_path / "idx")

    _submit(zpath, script, "create", "--table", table_dir,
            "--schema", "repo string, path string, commit string, lang string, content string",
            "--keys", "repo,path", "--num-buckets", "8")
    _submit(zpath, script, "replay", "--table", table_dir,
            "--source", src, "--batch-span", "400", "--max-batches", "1")
    created = _submit(
        zpath, script, "dedup-index-create", "--source", table_dir,
        "--index", idx_dir, "--id-expr", "concat(repo,'/',path)",
        "--text-expr", "content", "--n-hashes", "8", "--bands", "2",
        "--k", "4", "--num-buckets", "4")
    assert created["rows"] > 0 and created["rows"] % 2 == 0  # bands per doc

    _submit(zpath, script, "replay", "--table", table_dir,
            "--source", src, "--batch-span", "400")
    refreshed = _submit(zpath, script, "dedup-index-refresh",
                        "--source", table_dir, "--index", idx_dir)
    assert refreshed["to_version"] > refreshed["from_version"]
    again = _submit(zpath, script, "dedup-index-refresh",
                    "--source", table_dir, "--index", idx_dir)
    assert again["skipped"] is True

    # candidate batch: an exact clone of a live indexed doc + a unique doc
    live = LakeTable.load(spark, table_dir).read().limit(1).collect()[0]
    new_dir = str(tmp_path / "new")
    spark.createDataFrame(
        [("nX", "clone", live["content"]),
         ("nX", "uniq", "ein voellig anderes deutsches dokument ohne "
                        "jede gemeinsamkeit mit irgendwas hier drin")],
        "repo string, path string, content string").write.parquet(new_dir)
    out_dir = str(tmp_path / "pairs")
    matched = _submit(zpath, script, "dedup-index-match",
                      "--source", table_dir, "--index", idx_dir,
                      "--new", new_dir, "--min-sig-sim", "0.9",
                      "--cross-only", "--out", out_dir)
    assert matched["pairs"] >= 1
    pairs = {(r["new_id"], r["match_id"])
             for r in spark.read.parquet(out_dir).collect()}
    assert ("nX/clone", f"{live['repo']}/{live['path']}") in pairs
    assert all(nid != "nX/uniq" for nid, _ in pairs)
    shutil.rmtree(src, ignore_errors=True)
