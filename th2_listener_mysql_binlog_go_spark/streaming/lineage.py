"""Per-batch / per-partition lineage + metrics (FIXTURES.md §4).

Replaces the reference's per-message {name,pos,seq,timestamp} metadata
(/root/reference/component/listener/listener.go:325-332) and its
Prometheus liveness monitors (main.go:122-131) with commit-time lineage
rows: one row per (batch, bucket-partition) recording the GTID range and
applied row counts. Written driver-side with pyarrow (no Spark job — the
counts already rode the merge's ``observe()`` and the parquet footers of
the files the commit just wrote), mirroring how Iceberg writes manifests.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_SCHEMA = pa.schema(
    [
        ("batch_id", pa.int64()),
        ("gtid_min", pa.int64()),
        ("gtid_max", pa.int64()),
        ("partition_id", pa.int32()),  # bucket id; -1 = batch-level row
        ("rows_applied", pa.int64()),
        ("rows_inserted", pa.int64()),
        ("rows_updated", pa.int64()),
        ("rows_deleted", pa.int64()),
        ("ddl_applied", pa.int32()),
        ("wall_ms", pa.int64()),
        ("table_name", pa.string()),  # 'schema.table' routing target; NULL in single-table runs
    ]
)


class LineageWriter:
    def __init__(self, lineage_dir: str):
        self.dir = lineage_dir
        os.makedirs(lineage_dir, exist_ok=True)

    def write(self, rows: list[dict]) -> None:
        if not rows:
            return
        arrays = {name: [r.get(name) for r in rows] for name in LINEAGE_SCHEMA.names}
        table = pa.table(
            {n: pa.array(arrays[n], type=LINEAGE_SCHEMA.field(n).type) for n in LINEAGE_SCHEMA.names}
        )
        pq.write_table(table, os.path.join(self.dir, f"lineage-{rows[0]['batch_id']}-{uuid.uuid4().hex[:8]}.parquet"))

    def read(self, spark):
        return spark.read.parquet(self.dir)
