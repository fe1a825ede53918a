"""CDC-maintained MinHash-LSH dedup index (changelog consumer #2).

The lake's ``changes()`` feed maintains matview.py's aggregates; this
module maintains the OTHER derived state a training-data lake needs:
the near-dup index of functions/dedup.py, stored as its own LakeTable
(keys = (id, band)) and advanced incrementally — new/updated documents
are (re)hashed, deleted documents' band rows are tombstoned, and a
fresh ingest batch dedups against the index via
``minhash_lsh_incremental`` without ever re-shingling the indexed
corpus. The reference's downstream consumers rebuild this kind of
derived state by replaying the full feed (listener.go:296-315 publishes
everything, consumers keep their own stores); here the maintenance is a
first-class, crash-safe lake operation.

Scale shape of one refresh at 100 TB: one O(changes) changelog scan
(when the window is sound — lake.py changes_plan), one shingle/min-hash
aggregate over ONLY the changed documents' text, one keyed merge of
O(changed docs x bands) index rows. Matching a new batch against the
index is O(new + collisions) (functions/dedup.py). Nothing rescans the
corpus on either path.

Crash safety rides the lake's own machinery, identically to matview.py:
the refresh merges with ``batch_id = source_version``, so a
crashed-and-replayed refresh is a no-op, and the watermark
(``index_source_version``) commits atomically WITH the merged rows.

Invariant (pinned by tests and the ``cdc_dedup_index`` oracle): after
any refresh, the index state equals ``minhash_index`` recomputed from
scratch over the source's current state.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import minhash_index, minhash_lsh_incremental
from .lake import GTID_COL, OP_COL, LakeTable


class DedupIndexView:
    """A MinHash-LSH index over a source LakeTable's documents, stored
    as its own LakeTable and refreshed incrementally from
    ``source.changes()``.

    ``id_expr`` must be injective over the source's key columns (a PK
    move then surfaces as DELETE(old id) + INSERT(new id) through the
    changelog's net semantics); ``text_expr`` is the hashed content.
    Each document owns exactly ``bands`` index rows — keys (id, band) —
    so an UPDATE overwrites its rows in place and a DELETE tombstones
    the fixed band range without reading the old index state.

    The index inherits the full lake surface: snapshot isolation, time
    travel across refreshes, compaction, and its own ``changes()``.
    """

    #: storage-layout generation (the SEQ_ENCODING precedent: refuse,
    #: don't misread, when the hidden layout changed)
    FORMAT = "1"

    def __init__(self, spark: SparkSession, source: LakeTable, table: LakeTable):
        self.spark = spark
        self.source = source
        self.table = table
        props = table.snapshot.properties
        fmt = props.get("index_format")
        if fmt != self.FORMAT:
            raise ValueError(
                f"dedup index at {table.root} uses storage layout {fmt!r}; "
                f"this build reads {self.FORMAT!r} — recreate the index")
        want = props.get("index_source_root")
        if want is not None and os.path.realpath(source.root) != os.path.realpath(want):
            raise ValueError(
                f"index at {table.root} tracks source {want!r}, got "
                f"{source.root!r} — re-point with "
                "table.set_properties({'index_source_root': ...}) if the "
                "source genuinely moved")
        p = json.loads(props["index_params"])
        self.id_expr: str = p["id_expr"]
        self.text_expr: str = p["text_expr"]
        self.n_hashes: int = int(p["n_hashes"])
        self.bands: int = int(p["bands"])
        self.k: int = int(p["k"])

    # ------------------------------------------------------------ lifecycle

    @classmethod
    def create(cls, spark: SparkSession, source: LakeTable, root: str,
               id_expr: str, text_expr: str,
               n_hashes: int = 16, bands: int = 4, k: int = 5,
               num_buckets: int = 16) -> "DedupIndexView":
        """Full initial hash at the source's CURRENT version, then
        incremental forever (:meth:`refresh`)."""
        if n_hashes % bands != 0:
            raise ValueError(f"bands {bands} must divide n_hashes {n_hashes}")
        v0 = source.snapshot.version
        table = LakeTable.create(
            spark, root,
            [("id", "string"), ("band", "int"),
             ("bucket", "string"), ("sig", "array<bigint>")],
            key_cols=["id", "band"], num_buckets=num_buckets,
            properties={
                "index_format": cls.FORMAT,
                "index_source_version": str(v0),
                "index_source_root": source.root,
                "index_params": json.dumps({
                    "id_expr": id_expr, "text_expr": text_expr,
                    "n_hashes": n_hashes, "bands": bands, "k": k}),
            })
        view = cls(spark, source, table)
        rows = view._index_rows(source.read()).withColumn(OP_COL, F.lit("INSERT"))
        table.merge(
            rows.withColumn(GTID_COL, F.lit(v0).cast("bigint")),
            batch_id=v0, mode="mor",
            extra_properties={"index_source_version": str(v0)})
        return view

    @classmethod
    def load(cls, spark: SparkSession, source: LakeTable, root: str) -> "DedupIndexView":
        return cls(spark, source, LakeTable.load(spark, root))

    # ------------------------------------------------------------ internals

    def _doc_df(self, df: DataFrame) -> DataFrame:
        # NULL text coalesces to '' so EVERY live document owns exactly
        # ``bands`` index rows (shingles(NULL) explodes to nothing — an
        # UPDATE to NULL text would otherwise leave the old rows stale)
        return df.select(
            F.expr(self.id_expr).cast("string").alias("doc_id"),
            F.coalesce(F.expr(self.text_expr).cast("string"), F.lit("")).alias("text"))

    def _index_rows(self, df: DataFrame) -> DataFrame:
        return minhash_index(
            self._doc_df(df), text_col="text", id_col="doc_id",
            n_hashes=self.n_hashes, bands=self.bands, k=self.k,
        ).select("id", F.col("band").cast("int").alias("band"), "bucket", "sig")

    # ------------------------------------------------------------ refresh

    def refresh(self, mode: str = "auto") -> dict:
        """Advance the index to the source's current version: re-hash
        the changed documents, tombstone the deleted ones. Re-running
        after a crash is a no-op (batch_id gate); ``mode`` passes
        through to ``changes()``."""
        from_v = int(self.table.snapshot.properties["index_source_version"])
        to_v = self.source.snapshot.version
        if to_v <= from_v:
            return {"skipped": True, "from_version": from_v, "to_version": to_v}
        plan = self.source.changes_plan(from_v, to_v) if mode == "auto" else mode
        # the delta consumes the changelog twice (upserts + deletes) and
        # Catalyst does not dedup common subtrees — persist the scan so
        # the O(changes) plan (and its old-state join) runs once
        ch = self.source.changes(from_v, to_v, mode=mode).persist()
        try:
            ct = F.col("_change_type")
            upserts = (self._index_rows(ch.filter(ct != "DELETE"))
                       .withColumn(OP_COL, F.lit("INSERT")))
            deletes = (
                self._doc_df(ch.filter(ct == "DELETE"))  # DELETE carries the before image
                .select(F.col("doc_id").alias("id"))
                .withColumn("band", F.explode(F.array(*[F.lit(b) for b in range(self.bands)])))
                .withColumn("bucket", F.lit(None).cast("string"))
                .withColumn("sig", F.lit(None).cast("array<bigint>"))
                .withColumn(OP_COL, F.lit("DELETE")))
            delta = upserts.unionByName(deletes).withColumn(
                GTID_COL, F.lit(to_v).cast("bigint"))
            m = self.table.merge(
                delta, batch_id=to_v, mode="mor",
                extra_properties={"index_source_version": str(to_v)})
        finally:
            ch.unpersist()
        m.update({"from_version": from_v, "to_version": to_v, "plan": plan})
        return m

    def rebuild(self) -> dict:
        """Full re-hash in ONE atomic commit — the recovery path when
        the refresh watermark fell out of the source's retained snapshot
        history (``changes()`` raises "unknown or expired"; the index,
        like an aggregate view, CAN be safely rebuilt from current
        state). All previous index rows die via a ``truncate_gtid =
        v−1`` marker committed atomically WITH the recomputed rows
        (written at ``_gtid = v``): readers never see a half-rebuilt
        index, and a crash before the commit changes nothing."""
        v = self.source.snapshot.version
        from_v = int(self.table.snapshot.properties["index_source_version"])
        if v <= from_v:
            return {"skipped": True, "from_version": from_v, "to_version": v}
        rows = (self._index_rows(self.source.read())
                .withColumn(OP_COL, F.lit("INSERT"))
                .withColumn(GTID_COL, F.lit(v).cast("bigint")))
        m = self.table.merge(
            rows, batch_id=v, mode="mor",
            extra_properties={"index_source_version": str(v),
                              "truncate_gtid": str(v - 1)})
        m.update({"from_version": from_v, "to_version": v, "rebuilt": True})
        return m

    @property
    def source_version(self) -> int:
        return int(self.table.snapshot.properties["index_source_version"])

    # ------------------------------------------------------------ queries

    def read(self) -> DataFrame:
        """Current index rows (id, band, bucket, sig)."""
        return self.table.read().select("id", "band", "bucket", "sig")

    def match(self, new_df: DataFrame, min_sig_sim: float = 0.5,
              include_new_pairs: bool = True) -> DataFrame:
        """Near-dup matches of a candidate ingest batch against the
        indexed corpus (and itself): (new_id, match_id, sig_sim). The
        corpus is read from the index — its text is never touched."""
        return minhash_lsh_incremental(
            self.read(), self._doc_df(new_df),
            text_col="text", id_col="doc_id",
            n_hashes=self.n_hashes, bands=self.bands, k=self.k,
            min_sig_sim=min_sig_sim, include_new_pairs=include_new_pairs)
