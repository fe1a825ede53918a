"""Liveness/progress listener (S14 parity) over a real streaming query."""

import json
import time

from th2_listener_mysql_binlog_go_spark.streaming.metrics import (
    ProgressListener,
    runner_heartbeat,
)


def test_progress_listener(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.range(100).write.parquet(src)
    listener = ProgressListener(jsonl_path=str(tmp_path / "progress.jsonl"))
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("id long").parquet(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while not listener.ready and time.time() < deadline:
            time.sleep(0.5)
        assert listener.ready
        assert listener.alive
        snap = listener.snapshot()
        assert snap["last_progress"]["num_input_rows"] >= 0
        with open(tmp_path / "progress.jsonl") as f:
            lines = [json.loads(line) for line in f]
        assert len(lines) >= 1
    finally:
        spark.streams.removeListener(listener)


def test_runner_heartbeat(tmp_path):
    beat = runner_heartbeat(str(tmp_path / "hb.jsonl"))
    beat(1, {"rows_inserted": 5, "rows_updated": 2, "rows_deleted": 1, "ddl_applied": 0}, 123)
    beat(2, {"rows_inserted": 0, "rows_updated": 0, "rows_deleted": 0, "ddl_applied": 1}, 45)
    rows = [json.loads(line) for line in open(tmp_path / "hb.jsonl")]
    assert rows[0]["rows_applied"] == 8 and rows[1]["ddl_applied"] == 1


def test_dump_events_trace_analogue(spark, tmp_path):
    """Debug dump (listener.go:317-323 trace logging): a bounded sample of
    wire-serialized events lands in a JSONL file; the limit caps driver
    traffic plan-side."""
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        synthetic_changestream,
    )
    from th2_listener_mysql_binlog_go_spark.streaming.metrics import dump_events

    stream = synthetic_changestream(spark, 500, n_repos=5, n_paths=10)
    path = str(tmp_path / "trace" / "events.jsonl")
    n = dump_events(stream, path, limit=50)
    assert n == 50
    rows = [json.loads(line) for line in open(path)]
    assert len(rows) == 50
    assert all("payload" in r and "gtid" in r for r in rows)
    assert any('"Operation"' in r["payload"] for r in rows)
    # append semantics (a second dump extends the trace)
    assert dump_events(stream, path, limit=10) == 10
    assert sum(1 for _ in open(path)) == 60
