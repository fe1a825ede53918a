"""Liveness / progress metrics (operator S14 parity).

The reference wires Prometheus liveness+readiness monitors around its run
loop (/root/reference/main.go:122-131). The Spark-native equivalents:

- :class:`ProgressListener` — a ``StreamingQueryListener`` that folds each
  micro-batch's progress (rows/sec, batch duration, watermark) into an
  in-memory health snapshot and optional JSONL file. Liveness = "a batch
  completed recently"; readiness = "the query made progress".
- :func:`runner_heartbeat` — the batch-replay analogue: a callback the
  ReplayRunner can invoke per batch (same fields, no streaming engine).

Kept dependency-free (no Prometheus client in this sandbox): the snapshot
dict is the scrape surface; an exporter is a 10-line adapter."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.streaming import StreamingQueryListener


class ProgressListener(StreamingQueryListener):
    def __init__(self, jsonl_path: str | None = None, stale_after_s: float = 300.0):
        self.jsonl_path = jsonl_path
        self.stale_after_s = stale_after_s
        self.last_progress: dict | None = None
        self.last_progress_at: float | None = None
        self.started = False
        self.terminated = False
        self.error: str | None = None

    # -- listener hooks ----------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started = True

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.last_progress = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "process_rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
            "timestamp": p.timestamp,
        }
        self.last_progress_at = time.monotonic()
        if self.jsonl_path:
            os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(self.last_progress) + "\n")

    def onQueryTerminated(self, event) -> None:
        self.terminated = True
        self.error = getattr(event, "exception", None)

    def onQueryIdle(self, event) -> None:
        self.last_progress_at = time.monotonic()

    # -- scrape surface ----------------------------------------------------
    @property
    def alive(self) -> bool:
        if self.terminated and self.error:
            return False
        if self.last_progress_at is None:
            return self.started
        return (time.monotonic() - self.last_progress_at) < self.stale_after_s

    @property
    def ready(self) -> bool:
        return self.last_progress is not None

    def snapshot(self) -> dict:
        return {
            "alive": self.alive,
            "ready": self.ready,
            "terminated": self.terminated,
            "error": str(self.error) if self.error else None,
            "last_progress": self.last_progress,
        }


def dump_events(df, path: str, limit: int = 1000) -> int:
    """Debug event dump — the trace-level payload logging of the
    reference's run loop (/root/reference/component/listener/listener.go:
    317-323, which logs every published bean when trace is enabled), as a
    bounded sample: the first ``limit`` events of ``df`` (CHANGE_SCHEMA
    shape), wire-serialized to their published bean-JSON form, appended to
    a JSONL file. Driver traffic is capped at ``limit`` rows BY THE PLAN
    (the limit runs JVM-side before collect) — this is a debugging aid,
    never the data path. Returns the number of events written."""
    from ..sources.rawjson import encode_stream

    rows = encode_stream(df).limit(limit).collect()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps({
                "gtid": r["gtid"], "log_name": r["log_name"],
                "log_pos": r["log_pos"], "seq": r["seq"], "ts": r["ts"],
                "payload": r["payload"],
            }) + "\n")
    return len(rows)


def runner_heartbeat(jsonl_path: str):
    """Per-batch heartbeat writer for the batch replay runner."""

    def beat(batch_id: int, metrics: dict, wall_ms: int) -> None:
        os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
        with open(jsonl_path, "a") as f:
            f.write(json.dumps({
                "batch_id": batch_id, "wall_ms": wall_ms,
                "rows_applied": metrics.get("rows_inserted", 0)
                + metrics.get("rows_updated", 0) + metrics.get("rows_deleted", 0),
                "ddl_applied": metrics.get("ddl_applied", 0),
                "ts": time.time(),
            }) + "\n")

    return beat
