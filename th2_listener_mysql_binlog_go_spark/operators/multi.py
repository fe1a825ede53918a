"""Multi-table apply: route one change batch to every observed table.

The reference processes events for *every* configured (schema, table) pair
(/root/reference/component/listener/listener.go:236-241, config map at
component/configuration/configuration.go:26-32) and forwards CREATE/DROP
TABLE (component/bean/query.go:25-26). This module completes that contract
on the apply side: a :class:`MultiTableApplier` fans one micro-batch out to
per-pair :class:`~.apply.BatchApplier`\\ s over a
:class:`~..plans.catalog.LakeCatalog`, *executing* CREATE TABLE (column
defs parsed from the statement) and DROP TABLE as catalog commits in GTID
order relative to the pair's DML.

Scale shape: the batch's DDL rows are collected ONCE (tiny by
construction); each pair's DML slice is a Catalyst filter over the shared
batch scan — per-pair work is an independent Spark job exactly as the
single-table path, so K observed tables cost K merge jobs, not K stream
rescans of unrelated data (the (schema_name, table_name) filter prunes at
the source). Exactly-once is per-table (each LakeTable's sub-batch id
guard); catalog-level batch progress lives in catalog properties.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame

from ..plans.catalog import LakeCatalog
from .apply import ApplyConfig, BatchApplier, ddl_candidates_cond


class MultiTableApplier:
    def __init__(self, catalog: LakeCatalog, config: ApplyConfig | None = None):
        self.catalog = catalog
        self.config = config or ApplyConfig()

    def apply(self, batch: DataFrame, batch_id: int,
              precollected_ddl: list | None = None,
              resume_within_batch: bool = False) -> dict:
        """Apply one micro-batch to every observed pair. Returns aggregate
        metrics plus a per-pair breakdown under ``"tables"``."""
        rows = precollected_ddl if precollected_ddl is not None else (
            batch.filter(ddl_candidates_cond())
            .select("gtid", "op", "ddl", "schema_name", "table_name")
            .collect()
        )
        total = {
            "batch_id": batch_id, "rows_inserted": 0, "rows_updated": 0,
            "rows_deleted": 0, "ddl_applied": 0, "ddl_dropped": 0,
            "segments": 0, "tables": {},
        }
        for schema, table in self.config.observed_pairs():
            pair_cfg = replace(self.config, observed={schema: [table]})
            applier = BatchApplier(
                self.catalog.get(schema, table), pair_cfg,
                catalog=self.catalog, pair=(schema, table),
            )
            m = applier.apply(
                batch, batch_id,
                precollected_ddl=rows,
                resume_within_batch=resume_within_batch,
            )
            total["tables"][f"{schema}.{table}"] = m
            for k in ("rows_inserted", "rows_updated", "rows_deleted",
                      "ddl_applied", "ddl_dropped", "segments"):
                total[k] += m[k]
        return total
