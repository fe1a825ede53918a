"""Snapshot-versioned, hash-bucketed lake table format on plain parquet.

The north rule asks for Iceberg-style apply semantics (MERGE upsert, schema
evolution, exactly-once commits, time travel for lineage) but this sandbox
ships no Iceberg/Delta jars, so this module implements the minimal table
format that supplies them, Iceberg-style:

- **Atomic snapshot pointer.** Every commit writes an immutable JSON
  snapshot (``_meta/v{N}.json``) and atomically swaps ``_meta/HEAD`` to it
  (``os.replace``). Readers always see a complete snapshot; a crashed
  writer leaves only unreachable data files (cleanable, never corrupting).
- **Column-id based schema evolution** (like Iceberg's field-ids): every
  column gets a stable integer id; each commit records the physical schema
  of the files it wrote (a "schema epoch"). ADD/RENAME/WIDEN/DROP are
  metadata-only — old files are re-mapped on read by id, missing columns
  materialize as NULL, narrower physical types are cast up.
- **Hash-bucket layout for bounded copy-on-write MERGE.** Rows are assigned
  ``bucket = pmod(xxhash64(key...), num_buckets)``. A merge only reads and
  rewrites the buckets that contain changed keys; untouched buckets are
  carried into the new snapshot by reference. At 100 TB with e.g. 4096
  buckets, a micro-batch touching 1% of the key space rewrites ~1% of
  files and shuffles only batch + affected-bucket rows — never the table.
- **Exactly-once.** Each row stores ``_gtid`` (the GTID of its last
  writer) and each snapshot stores ``last_batch_id`` + ``watermark_gtid``
  properties. Replaying an already-applied batch is a metadata no-op
  (batch-id guard), and even a forced re-merge converges because the
  last-writer-wins window keys on ``_gtid`` (idempotent merge). This is
  strictly stronger than the reference listener's at-least-once resume
  (/root/reference/component/listener/listener.go:198-227).

Reference parity: this module is the apply-side completion of the Go
listener's downstream contract — its (name,pos) checkpoint token
(listener.go:325-332) becomes ``watermark_gtid``; its forwarded-only DDL
events (component/bean/query.go:23-29) become applied schema evolution.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

GTID_COL = "_gtid"
BUCKET_COL = "_bucket"
OP_COL = "_op"
_KEEP = "KEEP"

# Widening conversions allowed by ALTER COLUMN TYPE (Iceberg's rules).
_WIDEN_OK = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"), ("int", "double"),
    ("float", "double"),
    ("bigint", "string"), ("int", "string"),
}


@dataclass
class ColumnSpec:
    id: int
    name: str
    type: str  # Spark SQL simpleString, e.g. 'string', 'bigint', 'decimal(10,2)'
    nullable: bool = True

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_json(d: dict) -> "ColumnSpec":
        return ColumnSpec(d["id"], d["name"], d["type"], d.get("nullable", True))


@dataclass
class Snapshot:
    version: int
    columns: list[ColumnSpec]
    key_ids: list[int]
    num_buckets: int
    epoch: int
    epoch_schemas: dict[str, list[ColumnSpec]]  # epoch -> physical columns at write time
    files: list[dict]  # {"path": rel, "bucket": int, "epoch": int}
    properties: dict[str, str] = field(default_factory=dict)
    parent: int | None = None

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "columns": [c.to_json() for c in self.columns],
            "key_ids": self.key_ids,
            "num_buckets": self.num_buckets,
            "epoch": self.epoch,
            "epoch_schemas": {e: [c.to_json() for c in cols] for e, cols in self.epoch_schemas.items()},
            "files": self.files,
            "properties": self.properties,
            "parent": self.parent,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            version=d["version"],
            columns=[ColumnSpec.from_json(c) for c in d["columns"]],
            key_ids=d["key_ids"],
            num_buckets=d["num_buckets"],
            epoch=d["epoch"],
            epoch_schemas={e: [ColumnSpec.from_json(c) for c in cols] for e, cols in d["epoch_schemas"].items()},
            files=d["files"],
            properties=d.get("properties", {}),
            parent=d.get("parent"),
        )

    @property
    def key_names(self) -> list[str]:
        by_id = {c.id: c.name for c in self.columns}
        return [by_id[i] for i in self.key_ids]


def _struct_of(columns: list[ColumnSpec], extra_meta: bool = True) -> T.StructType:
    fields = [T.StructField(c.name, _parse_type(c.type), c.nullable) for c in columns]
    if extra_meta:
        fields.append(T.StructField(GTID_COL, T.LongType(), False))
        fields.append(T.StructField(BUCKET_COL, T.IntegerType(), False))
    return T.StructType(fields)


def _parse_type(s: str) -> T.DataType:
    return T.StructType.fromDDL(f"c {s}")[0].dataType


class LakeTable:
    """A snapshot-versioned bucketed table rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str, snapshot: Snapshot):
        self.spark = spark
        self.root = root
        self.snapshot = snapshot

    # ---------------------------------------------------------------- create/load

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: list[tuple[str, str]] | str,
        key_cols: list[str],
        num_buckets: int = 16,
        properties: dict[str, str] | None = None,
    ) -> "LakeTable":
        """Create an empty table. ``schema`` is [(name, sparkSqlType)] or a DDL string."""
        if isinstance(schema, str):
            st = T.StructType.fromDDL(schema)
            cols = [(f.name, f.dataType.simpleString()) for f in st.fields]
        else:
            cols = list(schema)
        columns = [ColumnSpec(i + 1, n, t) for i, (n, t) in enumerate(cols)]
        name_to_id = {c.name: c.id for c in columns}
        snap = Snapshot(
            version=0,
            columns=columns,
            key_ids=[name_to_id[k] for k in key_cols],
            num_buckets=num_buckets,
            epoch=0,
            epoch_schemas={"0": [ColumnSpec(c.id, c.name, c.type, c.nullable) for c in columns]},
            files=[],
            properties={"watermark_gtid": "-1", "last_batch_id": "-1", **(properties or {})},
        )
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        table = LakeTable(spark, root, snap)
        table._write_snapshot(snap)
        return table

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LakeTable":
        head = os.path.join(root, "_meta", "HEAD")
        with open(head) as f:
            snap_file = f.read().strip()
        with open(os.path.join(root, "_meta", snap_file)) as f:
            snap = Snapshot.from_json(json.load(f))
        return LakeTable(spark, root, snap)

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_meta", "HEAD"))

    def _write_snapshot(self, snap: Snapshot) -> None:
        """Commit = write immutable snapshot file, atomically swap HEAD."""
        meta = os.path.join(self.root, "_meta")
        fname = f"v{snap.version:012d}.json"
        with open(os.path.join(meta, fname), "w") as f:
            json.dump(snap.to_json(), f)
        tmp = os.path.join(meta, f"HEAD.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(fname)
        os.replace(tmp, os.path.join(meta, "HEAD"))  # atomic on POSIX
        self.snapshot = snap

    # ---------------------------------------------------------------- properties

    @property
    def watermark_gtid(self) -> int:
        return int(self.snapshot.properties.get("watermark_gtid", "-1"))

    @property
    def last_batch_id(self) -> int:
        return int(self.snapshot.properties.get("last_batch_id", "-1"))

    # ---------------------------------------------------------------- read

    def read(self, include_meta: bool = False, snapshot: Snapshot | None = None) -> DataFrame:
        """Current table state as a DataFrame (time travel via ``snapshot``).

        Files are grouped by schema epoch; each group is read with the
        exact physical schema it was written with, re-mapped to the current
        logical schema by column id (rename-safe), NULL-filled for columns
        added later, and cast up for widened types. Column pruning and
        filter pushdown still apply per group (plain parquet scans).
        """
        snap = snapshot or self.snapshot
        cur_types = {c.id: c.type for c in snap.columns}
        cur_names = {c.id: c.name for c in snap.columns}

        out_schema = _struct_of(snap.columns, extra_meta=True)
        if not snap.files:
            return self.spark.createDataFrame([], out_schema if include_meta else _struct_of(snap.columns, False))

        by_epoch: dict[str, list[str]] = {}
        for fi in snap.files:
            by_epoch.setdefault(str(fi["epoch"]), []).append(os.path.join(self.root, fi["path"]))

        parts = []
        for epoch, paths in by_epoch.items():
            phys = snap.epoch_schemas[epoch]
            df = self.spark.read.schema(_struct_of(phys, extra_meta=True)).parquet(*paths)
            sel = []
            phys_by_id = {c.id: c for c in phys}
            for cid, cname in cur_names.items():
                if cid in phys_by_id:
                    sel.append(F.col(phys_by_id[cid].name).cast(cur_types[cid]).alias(cname))
                else:  # column added after these files were written
                    sel.append(F.lit(None).cast(cur_types[cid]).alias(cname))
            sel += [F.col(GTID_COL), F.col(BUCKET_COL)]
            parts.append(df.select(*sel))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if not include_meta:
            df = df.drop(GTID_COL, BUCKET_COL)
        return df

    # ---------------------------------------------------------------- merge

    def bucket_expr(self, key_cols: list[str] | None = None):
        keys = key_cols or self.snapshot.key_names
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(self.snapshot.num_buckets)).cast("int")

    def merge(
        self,
        changes: DataFrame,
        batch_id: int,
        extra_properties: dict[str, str] | None = None,
        files_per_bucket: int = 1,
        batch_gtid_max: int | None = None,
    ) -> dict:
        """Copy-on-write MERGE of a change batch (the Iceberg ``MERGE INTO`` analogue).

        ``changes`` must carry the current logical columns plus ``_op``
        ('INSERT'|'UPDATE'|'DELETE') and ``_gtid`` (bigint, total order).
        Semantics: last writer (max ``_gtid``) wins per key; a winning
        DELETE removes the key; winning INSERT/UPDATE upserts the row —
        i.e. resolution happens on the *final* op per key, so
        DELETE→INSERT resurrection within one batch lands as the INSERT.

        Scale shape: shuffles only (batch ∪ affected buckets) by key for
        the LWW window, then once more by bucket for the write. Untouched
        buckets are carried by reference. ``files_per_bucket`` > 1 salts
        the write so one hot bucket is written by several tasks.

        Returns lineage metrics. Replay of an applied batch (batch_id <=
        last_batch_id) is a no-op returning {"skipped": True}.
        """
        snap = self.snapshot
        if batch_id <= self.last_batch_id:
            return {"skipped": True, "batch_id": batch_id}

        keys = snap.key_names
        # Lenient projection: logical columns the batch doesn't carry
        # (events decoded before an ADD COLUMN landed) materialize as NULL.
        avail = set(changes.columns)
        proj = [
            F.col(c.name).cast(c.type).alias(c.name) if c.name in avail
            else F.lit(None).cast(c.type).alias(c.name)
            for c in snap.columns
        ]
        changes = changes.select(*proj, OP_COL, GTID_COL).withColumn(
            BUCKET_COL, self.bucket_expr()
        )

        # Affected buckets: bounded by num_buckets, safe to collect.
        affected = sorted(
            r[0] for r in changes.select(BUCKET_COL).distinct().collect()
        )
        affected_set = set(affected)

        # Current contents of only the affected buckets.
        touched_files = [fi for fi in snap.files if fi["bucket"] in affected_set]
        untouched_files = [fi for fi in snap.files if fi["bucket"] not in affected_set]
        if touched_files:
            target_snap = Snapshot(
                version=snap.version, columns=snap.columns, key_ids=snap.key_ids,
                num_buckets=snap.num_buckets, epoch=snap.epoch,
                epoch_schemas=snap.epoch_schemas, files=touched_files,
            )
            target = self.read(include_meta=True, snapshot=target_snap).withColumn(
                OP_COL, F.lit(_KEEP)
            )
            unioned = target.unionByName(changes)
        else:
            unioned = changes

        # Last-writer-wins per key over the GTID total order (SURVEY.md §2
        # "needed by our engine"); tie-break KEEP<changes on equal gtid is
        # impossible by construction (gtids are unique, target rows carry
        # the gtid that wrote them, and the batch-id guard keeps replayed
        # batches out) but we order (_gtid, is_change) for determinism.
        w = Window.partitionBy(*keys).orderBy(
            F.col(GTID_COL).desc(), (F.col(OP_COL) == _KEEP).asc()
        )
        wf = Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = unioned.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_had_target", F.max(F.when(F.col(OP_COL) == _KEEP, 1).otherwise(0)).over(wf)
        )
        winners = ranked.filter(F.col("_rn") == 1)

        # observe() rides the write action — lineage metrics cost no extra pass.
        obs = Observation(f"merge-{batch_id}")
        is_change = F.col(OP_COL) != _KEEP
        winners = winners.observe(
            obs,
            F.sum(F.when(is_change & (F.col(OP_COL) != "DELETE") & (F.col("_had_target") == 0), 1)
                  .otherwise(0)).alias("rows_inserted"),
            F.sum(F.when(is_change & (F.col(OP_COL) != "DELETE") & (F.col("_had_target") == 1), 1)
                  .otherwise(0)).alias("rows_updated"),
            F.sum(F.when((F.col(OP_COL) == "DELETE") & (F.col("_had_target") == 1), 1)
                  .otherwise(0)).alias("rows_deleted"),
            F.max(F.when(is_change, F.col(GTID_COL))).alias("max_gtid"),
            F.min(F.when(is_change, F.col(GTID_COL))).alias("min_gtid"),
        )
        survivors = winners.filter(F.col(OP_COL) != "DELETE")

        # Physical write: salt spreads a hot bucket over several tasks/files.
        salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.lit(7)), F.lit(files_per_bucket))
        new_version = snap.version + 1
        commit_dir_rel = os.path.join("data", f"c{new_version:012d}-{uuid.uuid4().hex[:8]}")
        commit_dir = os.path.join(self.root, commit_dir_rel)
        phys_names = {c.id: c.name for c in snap.epoch_schemas[str(snap.epoch)]}
        cur_by_name = {c.name: c for c in snap.columns}
        out_cols = [F.col(c.name).alias(phys_names[cur_by_name[c.name].id]) for c in snap.columns]
        (
            survivors.repartition(F.col(BUCKET_COL), salt)
            .select(*out_cols, F.col(GTID_COL), F.col(BUCKET_COL),
                    F.col(BUCKET_COL).alias("_bucket_p"))
            .write.partitionBy("_bucket_p")
            .parquet(commit_dir)
        )
        m = obs.get

        written = self._list_commit_files(commit_dir_rel, snap.epoch)
        new_files = untouched_files + written

        # Per-partition lineage from the parquet footers of the files this
        # commit wrote (driver-side metadata reads, no extra Spark pass).
        import pyarrow.parquet as pq

        per_bucket: dict[int, int] = {}
        for fi in written:
            n = pq.ParquetFile(os.path.join(self.root, fi["path"])).metadata.num_rows
            per_bucket[fi["bucket"]] = per_bucket.get(fi["bucket"], 0) + n

        props = dict(snap.properties)
        batch_max = batch_gtid_max if batch_gtid_max is not None else m["max_gtid"]
        if batch_max is None:
            batch_max = self.watermark_gtid
        props["watermark_gtid"] = str(max(self.watermark_gtid, batch_max))
        props["last_batch_id"] = str(batch_id)
        props.update(extra_properties or {})

        new_snap = Snapshot(
            version=new_version, columns=snap.columns, key_ids=snap.key_ids,
            num_buckets=snap.num_buckets, epoch=snap.epoch,
            epoch_schemas=snap.epoch_schemas, files=new_files,
            properties=props, parent=snap.version,
        )
        self._write_snapshot(new_snap)
        return {
            "skipped": False,
            "batch_id": batch_id,
            "rows_inserted": int(m["rows_inserted"] or 0),
            "rows_updated": int(m["rows_updated"] or 0),
            "rows_deleted": int(m["rows_deleted"] or 0),
            "gtid_min": m["min_gtid"],
            "gtid_max": m["max_gtid"],
            "buckets_touched": len(affected),
            "partitions": sorted(per_bucket.items()),
            "version": new_version,
        }

    def _list_commit_files(self, commit_dir_rel: str, epoch: int) -> list[dict]:
        out = []
        base = os.path.join(self.root, commit_dir_rel)
        for dirpath, _dirs, fnames in os.walk(base):
            for fn in fnames:
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                bucket = None
                for seg in rel.split(os.sep):
                    if seg.startswith("_bucket_p="):
                        bucket = int(seg.split("=", 1)[1])
                if bucket is None:
                    raise ValueError(f"no bucket dir in {rel}")
                out.append({"path": rel, "bucket": bucket, "epoch": epoch})
        return out

    # ---------------------------------------------------------------- DDL

    def _commit_meta(self, columns: list[ColumnSpec], files: list[dict] | None = None,
                     bump_epoch: bool = True, extra_properties: dict[str, str] | None = None) -> None:
        snap = self.snapshot
        new_epoch = snap.epoch + 1 if bump_epoch else snap.epoch
        epoch_schemas = dict(snap.epoch_schemas)
        if bump_epoch:
            epoch_schemas[str(new_epoch)] = [ColumnSpec(c.id, c.name, c.type, c.nullable) for c in columns]
        props = dict(snap.properties)
        props.update(extra_properties or {})
        self._write_snapshot(Snapshot(
            version=snap.version + 1, columns=columns, key_ids=snap.key_ids,
            num_buckets=snap.num_buckets, epoch=new_epoch, epoch_schemas=epoch_schemas,
            files=snap.files if files is None else files, properties=props, parent=snap.version,
        ))

    def add_column(self, name: str, type_: str) -> None:
        """ALTER TABLE ADD COLUMN — metadata only; old files read as NULL."""
        if any(c.name == name for c in self.snapshot.columns):
            raise ValueError(f"column {name} exists")
        next_id = max(c.id for c in self.snapshot.columns) + 1
        self._commit_meta(self.snapshot.columns + [ColumnSpec(next_id, name, type_)])

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN — id-stable, metadata only."""
        cols = [ColumnSpec(c.id, new if c.name == old else c.name, c.type, c.nullable)
                for c in self.snapshot.columns]
        if not any(c.name == new for c in cols):
            raise ValueError(f"no column {old}")
        self._commit_meta(cols)

    def widen_column(self, name: str, new_type: str) -> None:
        """ALTER TABLE ALTER COLUMN TYPE — widening only, metadata only."""
        cols = []
        found = False
        for c in self.snapshot.columns:
            if c.name == name:
                found = True
                if c.type != new_type and (c.type, new_type) not in _WIDEN_OK:
                    raise ValueError(f"narrowing/unsupported: {c.type} -> {new_type}")
                cols.append(ColumnSpec(c.id, c.name, new_type, c.nullable))
            else:
                cols.append(c)
        if not found:
            raise ValueError(f"no column {name}")
        self._commit_meta(cols)

    def drop_column(self, name: str) -> None:
        if name in self.snapshot.key_names:
            raise ValueError("cannot drop a key column")
        cols = [c for c in self.snapshot.columns if c.name != name]
        if len(cols) == len(self.snapshot.columns):
            raise ValueError(f"no column {name}")
        self._commit_meta(cols)

    def truncate(self, extra_properties: dict[str, str] | None = None) -> None:
        """TRUNCATE TABLE (reference op: component/bean/query.go:24) — drop all file refs."""
        self._commit_meta(self.snapshot.columns, files=[], bump_epoch=False,
                          extra_properties=extra_properties)

    def set_properties(self, props: dict[str, str]) -> None:
        self._commit_meta(self.snapshot.columns, bump_epoch=False, extra_properties=props)

    # ---------------------------------------------------------------- maintenance

    def compact(self, target_buckets: list[int] | None = None) -> int:
        """Rewrite each (multi-file) bucket into one file per epoch-current
        schema. Keeps read plans small as commits accumulate; the 100 TB
        analogue of Iceberg's rewrite_data_files."""
        snap = self.snapshot
        from collections import Counter

        counts = Counter(fi["bucket"] for fi in snap.files)
        todo = [b for b, n in counts.items() if n > 1 and (target_buckets is None or b in target_buckets)]
        if not todo:
            return 0
        todo_set = set(todo)
        keep = [fi for fi in snap.files if fi["bucket"] not in todo_set]
        sub = Snapshot(version=snap.version, columns=snap.columns, key_ids=snap.key_ids,
                       num_buckets=snap.num_buckets, epoch=snap.epoch,
                       epoch_schemas=snap.epoch_schemas,
                       files=[fi for fi in snap.files if fi["bucket"] in todo_set])
        df = self.read(include_meta=True, snapshot=sub)
        new_version = snap.version + 1
        commit_dir_rel = os.path.join("data", f"c{new_version:012d}-compact-{uuid.uuid4().hex[:8]}")
        phys_names = {c.id: c.name for c in snap.epoch_schemas[str(snap.epoch)]}
        out_cols = [F.col(c.name).alias(phys_names[c.id]) for c in snap.columns]
        (
            df.repartition(F.col(BUCKET_COL))
            .select(*out_cols, F.col(GTID_COL), F.col(BUCKET_COL), F.col(BUCKET_COL).alias("_bucket_p"))
            .write.partitionBy("_bucket_p").parquet(os.path.join(self.root, commit_dir_rel))
        )
        files = keep + self._list_commit_files(commit_dir_rel, snap.epoch)
        self._write_snapshot(Snapshot(
            version=new_version, columns=snap.columns, key_ids=snap.key_ids,
            num_buckets=snap.num_buckets, epoch=snap.epoch, epoch_schemas=snap.epoch_schemas,
            files=files, properties=dict(snap.properties), parent=snap.version,
        ))
        return len(todo)
