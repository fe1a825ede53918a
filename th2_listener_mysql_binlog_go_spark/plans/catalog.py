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
(reachable for time travel / undrop, cleanable by :meth:`LakeCatalog.vacuum`)
— the registry entry just stops pointing at it, so DROP is O(1) and
crash-safe.

Two property channels with different cost profiles (round-3 review #3):

- **Registry properties** (:meth:`set_properties`) — durable, versioned,
  one full registry JSON per update. For rare changes (config, ownership).
- **Progress properties** (:meth:`set_progress`) — per-batch watermarks.
  A single small ``PROGRESS`` file, atomically swapped in place, O(1)
  files and O(progress) bytes regardless of batch count — the catalog
  analogue of the reference's O(1) checkpoint file
  (/root/reference/component/listener/listener.go:198-227). Readers see
  registry properties overlaid by progress. Crash between a table commit
  and the progress swap replays one batch of per-table guarded no-ops.

Concurrency: registry commits use the same optimistic HEAD check +
exclusive-create (O_EXCL) version files as ``LakeTable._write_snapshot`` —
a lost race is a hard :class:`~.lake.ConcurrentCommitError`, never a
silently truncated committed file. Best-effort on a plain filesystem (the
check-then-swap window narrows to the orphan-reclaim path); an object
store deployment would use a conditional PUT. Runners are single-writer
per catalog by design — the guard catches misconfiguration.

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
            cat = LakeCatalog(spark, root, json.load(f))
        return cat

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_catalog", "HEAD"))

    def _write_registry(self) -> None:
        from .lake import ConcurrentCommitError, _excl_write_json, _version_of

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
                raise ConcurrentCommitError(
                    f"catalog HEAD moved to {cur} while this writer was "
                    f"based on {expected}: concurrent commit detected — "
                    "reload the catalog and retry"
                )
        fname = f"r{version:012d}.json"
        # O_EXCL exclusive create: the per-commit filename is a CAS — the
        # second writer past the same HEAD check hard-fails instead of
        # truncating the winner (see lake._excl_write_json; same age-gated
        # crashed-writer reclaim rule and residual stalled-writer window).
        _excl_write_json(meta, fname, self.registry,
                         head_is_behind=lambda cur: _version_of(cur, "r") < version)
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
        """Registry properties overlaid by the O(1) progress file — the
        merged read view. Mutations go through :meth:`set_properties`
        (durable, versioned) or :meth:`set_progress` (per-batch, O(1))."""
        merged = dict(self.registry.setdefault("properties", {}))
        merged.update(self._read_progress())
        return merged

    def set_properties(self, props: dict[str, str]) -> None:
        """Durable registry-property update: one full registry version per
        call. For rare changes; per-batch watermarks belong in
        :meth:`set_progress`.

        A durable set of a key that also lives in the PROGRESS overlay
        (e.g. an operator resetting ``watermark_gtid``) evicts that key
        from PROGRESS first — otherwise the stale progress value would
        silently mask the new durable one for every reader (round-4 advice
        #4). Eviction is ordered BEFORE the registry commit: a crash
        between the two leaves the key unset in progress and old in the
        registry — a clean retry, never a masked write."""
        progress = self._read_progress()
        overlap = [k for k in props if k in progress]
        if overlap:
            for k in overlap:
                del progress[k]
            tmp = f"{self._progress_path()}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(progress, f)
            os.replace(tmp, self._progress_path())
        self.registry.setdefault("properties", {}).update(props)
        self._bump()

    # ------------------------------------------------------- progress (O(1))

    def _progress_path(self) -> str:
        return os.path.join(self.root, "_catalog", "PROGRESS")

    def _read_progress(self) -> dict:
        try:
            with open(self._progress_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def set_progress(self, props: dict[str, str]) -> None:
        """Per-batch progress (watermark_gtid, last_complete_batch): one
        small JSON file, atomically swapped in place — O(1) catalog files
        for any number of batches, vs one full registry version per batch
        (round-3 review #3). Readers see it overlaid on registry
        properties; a crash mid-swap leaves the previous complete file."""
        merged = {**self._read_progress(), **props}
        tmp = f"{self._progress_path()}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, self._progress_path())

    # ------------------------------------------------------------- maintenance

    def expire_versions(self, keep_last: int = 10) -> int:
        """Drop registry version files older than the newest ``keep_last``
        (the catalog analogue of LakeTable.expire_snapshots). Never touches
        HEAD's target. Returns the number of files removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        meta = os.path.join(self.root, "_catalog")
        cutoff = self.registry["version"] - keep_last + 1
        removed = 0
        for fn in os.listdir(meta):
            if not (fn.startswith("r") and fn.endswith(".json")):
                continue
            try:
                version = int(fn[1:-5])
            except ValueError:
                continue
            if version < cutoff:
                os.remove(os.path.join(meta, fn))
                removed += 1
        return removed

    def vacuum(self, older_than_s: float = 3 * 86400) -> int:
        """Delete table directories under ``{root}/tables/`` that no
        retained registry version lists as LIVE (i.e. dropped — or never
        committed — across the whole retained history), age-gated by mtime
        like :meth:`~.lake.LakeTable.vacuum`. Reclaims dropped tables'
        data once their drop predates the retained registry history plus
        the grace window. Returns directories removed. Run after
        :meth:`expire_versions`; ``older_than_s=0`` requires no concurrent
        writer (a table mid-CREATE looks like an orphan)."""
        import shutil
        import time as _time

        meta = os.path.join(self.root, "_catalog")
        live_dirs: set[str] = set()
        for fn in os.listdir(meta):
            if fn.startswith("r") and fn.endswith(".json"):
                with open(os.path.join(meta, fn)) as f:
                    reg = json.load(f)
                live_dirs.update(
                    e["dir"] for e in reg.get("tables", {}).values()
                    if not e.get("dropped")
                )
        tables_root = os.path.join(self.root, "tables")
        if not os.path.isdir(tables_root):
            return 0
        cutoff = _time.time() - max(older_than_s, 0)
        removed = 0
        for name in os.listdir(tables_root):
            rel = os.path.join("tables", name)
            full = os.path.join(tables_root, name)
            if rel in live_dirs or not os.path.isdir(full):
                continue
            if os.path.getmtime(full) <= cutoff:
                shutil.rmtree(full)
                removed += 1
        return removed
