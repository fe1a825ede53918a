"""Multi-table catalog: routes (schema, table) pairs to LakeTables and
executes CREATE/DROP TABLE.

The reference observes a *map* of schemas -> tables
(/root/reference/component/configuration/configuration.go:26-32,
component/database/db_metadata.go:33-37) and processes events for every
observed table (component/listener/listener.go:236-241); CREATE/DROP are
classified and forwarded (component/bean/query.go:25-26). This catalog is
the apply-side completion: each observed pair gets its own
:class:`~.lake.LakeTable` under ``{root}/{schema}.{table}/``, and
CREATE/DROP TABLE become catalog commits.

Commit protocol mirrors the table format (Iceberg-catalog-style): the
registry is an immutable JSON version file plus an atomically swapped
``HEAD`` pointer. A dropped table's data directory is abandoned in place
(reachable for time travel / undrop, cleanable by maintenance) — the
registry entry just stops pointing at it, so DROP is O(1) and crash-safe.

CREATE is create-if-absent and DROP is drop-if-present: both idempotent,
so a crash-replayed batch containing them converges without extra
bookkeeping (the per-table batch-id guard covers the DML side).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

from .lake import LakeTable


class LakeCatalog:
    """A directory of LakeTables keyed by (schema, table)."""

    def __init__(self, spark: SparkSession, root: str, registry: dict):
        self.spark = spark
        self.root = root
        self.registry = registry  # {"version": int, "tables": {"s.t": {"dir": rel, "dropped": bool}}, "properties": {...}}

    # ------------------------------------------------------------- load/create

    @staticmethod
    def create(spark: SparkSession, root: str) -> "LakeCatalog":
        os.makedirs(os.path.join(root, "_catalog"), exist_ok=True)
        cat = LakeCatalog(spark, root, {"version": 0, "tables": {}, "properties": {}})
        cat._write_registry()
        return cat

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LakeCatalog":
        with open(os.path.join(root, "_catalog", "HEAD")) as f:
            fname = f.read().strip()
        with open(os.path.join(root, "_catalog", fname)) as f:
            return LakeCatalog(spark, root, json.load(f))

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_catalog", "HEAD"))

    def _write_registry(self) -> None:
        meta = os.path.join(self.root, "_catalog")
        version = self.registry["version"]
        if version > 0:
            # optimistic concurrency, as in LakeTable._write_snapshot: a
            # concurrent committer surfaces as an error, never a silent
            # lost registry update
            expected = f"r{version - 1:012d}.json"
            try:
                with open(os.path.join(meta, "HEAD")) as f:
                    cur = f.read().strip()
            except FileNotFoundError:
                cur = expected
            if cur != expected:
                from .lake import ConcurrentCommitError

                raise ConcurrentCommitError(
                    f"catalog HEAD moved to {cur} while this writer was "
                    f"based on {expected}: concurrent commit detected — "
                    "reload the catalog and retry"
                )
        fname = f"r{version:012d}.json"
        with open(os.path.join(meta, fname), "w") as f:
            json.dump(self.registry, f)
        tmp = os.path.join(meta, f"HEAD.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(fname)
        os.replace(tmp, os.path.join(meta, "HEAD"))

    def _bump(self) -> None:
        self.registry["version"] += 1
        self._write_registry()

    # ------------------------------------------------------------- tables

    @staticmethod
    def _key(schema: str, table: str) -> str:
        return f"{schema}.{table}"

    def get(self, schema: str, table: str) -> LakeTable | None:
        ent = self.registry["tables"].get(self._key(schema, table))
        if ent is None or ent.get("dropped"):
            return None
        return LakeTable.load(self.spark, os.path.join(self.root, ent["dir"]))

    def table_exists(self, schema: str, table: str) -> bool:
        ent = self.registry["tables"].get(self._key(schema, table))
        return ent is not None and not ent.get("dropped")

    def list_tables(self) -> list[str]:
        return sorted(k for k, e in self.registry["tables"].items() if not e.get("dropped"))

    def create_table(
        self,
        schema: str,
        table: str,
        columns: list[tuple[str, str]] | str,
        key_cols: list[str],
        num_buckets: int = 16,
        if_not_exists: bool = True,
    ) -> LakeTable:
        """CREATE TABLE (idempotent by default: an existing live table is
        returned unchanged, so crash-replays converge)."""
        existing = self.get(schema, table)
        if existing is not None:
            if if_not_exists:
                return existing
            raise ValueError(f"table {schema}.{table} exists")
        # fresh generation dir per incarnation: a DROP + re-CREATE never
        # resurrects the old incarnation's files
        rel = os.path.join("tables", f"{self._key(schema, table)}-{uuid.uuid4().hex[:8]}")
        t = LakeTable.create(self.spark, os.path.join(self.root, rel), columns,
                             key_cols=key_cols, num_buckets=num_buckets)
        self.registry["tables"][self._key(schema, table)] = {"dir": rel, "dropped": False}
        self._bump()
        return t

    def drop_table(self, schema: str, table: str, if_exists: bool = True) -> bool:
        """DROP TABLE — registry-only (O(1), crash-safe); data files are
        abandoned for maintenance cleanup. Idempotent with if_exists."""
        ent = self.registry["tables"].get(self._key(schema, table))
        if ent is None or ent.get("dropped"):
            if if_exists:
                return False
            raise ValueError(f"no table {schema}.{table}")
        ent["dropped"] = True
        self._bump()
        return True

    # ------------------------------------------------------------- properties

    @property
    def properties(self) -> dict:
        return self.registry.setdefault("properties", {})

    def set_properties(self, props: dict[str, str]) -> None:
        self.properties.update(props)
        self._bump()
