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
