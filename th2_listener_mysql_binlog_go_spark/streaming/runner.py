"""Micro-batch replay runner: checkpointed, exactly-once, resumable.

The Spark analogue of the reference's sync loop + resume logic
(/root/reference/component/listener/listener.go:85-227):

- **Batch planning is deterministic**: batch k covers GTIDs
  [k*span, (k+1)*span). Resume recomputes k0 from the table's persisted
  ``watermark_gtid`` — no external checkpoint store needed; the *table
  itself* is the checkpoint (the (name,pos) token of listener.go:325-332
  become snapshot properties). A partially applied batch is replayed from
  its top; the per-sub-batch id guard in :class:`BatchApplier` makes the
  already-applied prefix a no-op (cf. the reference's weaker resume from
  last *published* message, which can re-emit — we converge exactly).
- **Source-range validation** (the error-1236 recovery analogue,
  listener.go:91-110): a watermark beyond the source's max GTID clamps to
  a no-op; a watermark before the source's min (expired binlog) raises
  unless ``allow_gaps`` — matching the reference's choice to restart from
  the earliest available position.
- At scale the source table is partitioned/sorted by GTID range, so each
  batch's ``gtid`` filter becomes partition pruning + a parquet range
  scan — no full-stream rescans per batch.

An event-driven Structured Streaming shell with ``foreachBatch`` is in
:mod:`.structured` — batch planning there comes from the stream engine,
while apply semantics are identical.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.apply import ApplyConfig, BatchApplier
from ..plans.lake import LakeTable
from .lineage import LineageWriter


def _check_recorded_span(recorded: str | None, span: int, kind: str) -> None:
    """Refuse a resume whose batch_span disagrees with the recorded one.

    Shared by both runners so the guard (and its message) cannot drift:
    a changed span is silently wrong in both directions — larger
    regresses sub-batch ids below the exactly-once guard (whole run
    no-ops), smaller re-enters applied gtids without the within-batch
    filter (re-appended overlap). ``recorded is None`` (pre-guard
    history, or a fresh table) passes; callers record the span on first
    use.
    """
    if recorded is not None and int(recorded) != span:
        raise ValueError(
            f"batch_span={span} does not match this {kind}'s recorded "
            f"replay_batch_span={recorded}; resume with the original "
            "span (a changed span silently no-ops or re-appends batches)")


def _ddl_windows(runner, stream: DataFrame, ks: list[int], span: int):
    """Yield ``(window_ks, {k: ddl_rows})`` with one driver collect per
    ``runner.prescan_window`` batches. DDL is ~1e-4 of a change stream and
    the candidate condition is a JVM-side regex prefilter, so each collect
    is tiny; windowing bounds driver memory at O(window) for unbounded
    runs (round-2 review item #4). ``runner.max_prescan_rows`` records the
    largest single collect for boundedness assertions."""
    from ..operators.apply import ddl_candidates_cond

    w = runner.prescan_window
    for i in range(0, len(ks), w):
        wks = ks[i:i + w]
        lo_g, hi_g = wks[0] * span, (wks[-1] + 1) * span
        cond = (ddl_candidates_cond()
                & (F.col("gtid") >= lo_g) & (F.col("gtid") < hi_g))
        cond = cond & runner._partition_pred(lo_g, hi_g)
        rows = sorted(
            (
                stream.filter(cond)
                .select("gtid", "op", "ddl", "schema_name", "table_name")
                .collect()
            ),
            key=lambda r: r["gtid"],
        )
        runner.max_prescan_rows = max(runner.max_prescan_rows, len(rows))
        yield wks, {
            k: [r for r in rows if k * span <= r["gtid"] < (k + 1) * span]
            for k in wks
        }


class ReplayRunner:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        batch_span: int = 100_000,
        config: ApplyConfig | None = None,
        lineage_dir: str | None = None,
        pipeline_depth: int = 1,
        prescan_window: int = 256,
        partition_col: str | None = None,
        partition_span: int | None = None,
        archive_root: str | None = None,
    ):
        """``pipeline_depth`` > 1 overlaps the delta-WRITE jobs of up to
        that many consecutive no-DDL mor batches (independent Spark jobs,
        distinct commit dirs) while snapshot commits stay strictly batch-
        ordered — the Iceberg-style split of parallel data writes from a
        serial metadata pointer swap. Batches carrying DDL (or a partial
        resume) drain the pipeline and run through the sequential
        segment/DDL path unchanged, so evolution ordering is preserved.
        Exactly-once is untouched: a crash orphans staged (uncommitted,
        unreachable) files — the same story as any crashed writer.

        ``prescan_window``: the DDL pre-scan collects at most this many
        batches' worth of DDL rows at a time, so driver memory stays
        O(window), never O(run) — an unbounded 10^10-event replay holds
        ~window * span * ddl_rate rows (~tens) regardless of run length.
        The pipeline rides across window boundaries (the next collect
        runs on the driver thread while staged jobs proceed).

        ``partition_col``/``partition_span``: when the source archive is
        hive-partitioned by GTID range (dirs ``{partition_col}=N`` where
        ``N = gtid // partition_span``, as
        :func:`~..sources.changestream.write_gtid_partitioned` lays out),
        batch k's filter ALSO constrains the partition column, so
        Catalyst's partition pruning drops every other partition's files
        from the scan at PLANNING time — batch cost is O(its span's
        files), not O(archive listing + row-group skips). A range filter
        on ``gtid`` alone cannot prune (no gtid->dir transitivity in the
        optimizer); the explicit predicate restores it. Verified by
        tests/test_partition_pruning.py via scan metrics.

        ``archive_root``: filesystem root of the hive-partitioned archive.
        When set (with partitioning declared), resume's bounds discovery
        reads the candidate extreme partition VALUES from ONE root-level
        directory listing — O(partitions) driver cost, file-count
        independent — instead of enumerating every archive file (round-4
        review: at a 10^6-file archive the full listing was the new serial
        cost the pruned scan had just removed)."""
        self.spark = spark
        self.table = table
        self.batch_span = batch_span
        self.applier = BatchApplier(table, config)
        self.lineage = LineageWriter(lineage_dir) if lineage_dir else None
        self.pipeline_depth = max(1, pipeline_depth)
        self.prescan_window = max(1, prescan_window)
        self.partition_col = partition_col
        self.partition_span = partition_span
        self.archive_root = archive_root
        # instrumentation: max DDL rows held by any single window's
        # pre-scan (tests assert boundedness)
        self.max_prescan_rows = 0

    def _partition_pred(self, lo_g: int, hi_g: int):
        """Partition-column predicate covering GTIDs [lo_g, hi_g) — TRUE
        when no archive partitioning was declared."""
        if self.partition_col is None or not self.partition_span:
            return F.lit(True)
        ps = self.partition_span
        return F.col(self.partition_col).between(lo_g // ps, (hi_g - 1) // ps)

    def _listed_extreme_partitions(self) -> tuple[int, int] | None:
        """Candidate (min, max) partition values from ONE root-level
        directory listing of ``archive_root`` — O(partitions) driver cost,
        independent of the archive's file count (round-4 review: the old
        ``stream.inputFiles()`` path shipped every file path through the
        driver, the one remaining O(archive) serial cost on resume)."""
        if not self.archive_root:
            return None
        import os

        prefix = f"{self.partition_col}="
        vals = []
        try:
            entries = os.listdir(self.archive_root)
        except OSError:
            return None
        for d in entries:
            if d.startswith(prefix):
                try:
                    vals.append(int(d[len(prefix):]))
                except ValueError:
                    continue
        return (min(vals), max(vals)) if vals else None

    def _extreme_partition_bounds(self, stream: DataFrame, lo_p: int, hi_p: int):
        """Exact (lo, hi) gtid from the two extreme partitions, grouped BY
        partition so an extreme partition emptied by an upstream filter is
        DETECTED (its group is absent) rather than silently replaced by the
        other extreme's values — the wrong-bounds hazard of aggregating the
        two partitions together (round-4 advice #1). Returns None when
        either extreme has no surviving rows."""
        pcol = self.partition_col
        per = {
            r["p"]: r
            for r in stream.filter(F.col(pcol).isin(lo_p, hi_p))
            .groupBy(F.col(pcol).alias("p"))
            .agg(F.min("gtid").alias("lo"), F.max("gtid").alias("hi"))
            .collect()
        }
        if lo_p in per and hi_p in per:
            # every row of a lower partition precedes every row of a higher
            # one, so the extremes' per-partition min/max ARE the global ones
            return {"lo": per[lo_p]["lo"], "hi": per[hi_p]["hi"]}
        return None

    def _bounds(self, stream: DataFrame):
        """(min, max) gtid of the source — correct for ANY input DataFrame,
        including a pre-filtered archive read (round-4 advice #1).

        Un-partitioned: one full-stream agg — fine for a bounded replay,
        but it rescans the WHOLE archive every run. With declared
        partitioning, candidate extreme partitions come from (a) one
        root-level dir listing when ``archive_root`` is set — O(partitions)
        driver cost, zero data read — else (b) a distributed min/max agg
        over the partition COLUMN alone (column-pruned to metadata: the
        scan reads partition values + footer row counts, no data pages, and
        honors any upstream filter). The exact gtid min/max then scans only
        the two extreme partitions, grouped by partition so a
        filter-emptied extreme falls back to (b) instead of returning the
        wrong bounds."""
        pcol = self.partition_col
        if pcol and self.partition_span:
            cand = self._listed_extreme_partitions()
            if cand is not None:
                b = self._extreme_partition_bounds(stream, *cand)
                if b is not None:
                    return b
                # an extreme dir exists but has no surviving rows (upstream
                # filter): discover the FILTERED stream's true extremes
            ext = stream.agg(
                F.min(pcol).alias("plo"), F.max(pcol).alias("phi")
            ).collect()[0]
            if ext["plo"] is None:
                return {"lo": None, "hi": None}
            b = self._extreme_partition_bounds(stream, ext["plo"], ext["phi"])
            if b is not None:
                return b
        row = stream.agg(
            F.min("gtid").alias("lo"), F.max("gtid").alias("hi")
        ).collect()[0]
        return {"lo": row["lo"], "hi": row["hi"]}

    def batch_df(self, stream: DataFrame, k: int) -> DataFrame:
        """Batch k's slice: the gtid range filter plus (when declared) the
        partition predicate that lets the scan prune to the span's dirs."""
        span = self.batch_span
        return stream.filter(
            (F.col("gtid") >= k * span) & (F.col("gtid") < (k + 1) * span)
            & self._partition_pred(k * span, (k + 1) * span)
        )

    def run(
        self,
        stream: DataFrame,
        max_batches: int | None = None,
        allow_gaps: bool = False,
        bounds: tuple[int, int] | None = None,
    ) -> dict:
        """Replay ``stream`` (change events, CHANGE_SCHEMA-shaped) into the
        table from the current watermark. Returns summary metrics.

        ``bounds``: the stream's exact ``(min_gtid, max_gtid)`` when the
        caller already computed it — skips the discovery aggregation job
        (one full-stream scan for an unpartitioned source). Bounds that
        are not the stream's true extremes silently mis-plan batches
        (stale hi skips the tail; stale lo over-spans), so only pass
        values measured from THIS stream."""
        if bounds is not None:
            b_lo, b_hi = bounds
            bounds = {"lo": b_lo, "hi": b_hi}
        else:
            bounds = self._bounds(stream)
        if bounds["lo"] is None:
            return {"batches": 0, "events": 0}
        lo, hi = bounds["lo"], bounds["hi"]
        wm = self.table.watermark_gtid

        if wm >= hi:
            return {"batches": 0, "events": 0, "clamped": True}
        if wm >= 0 and wm < lo - 1 and not allow_gaps:
            # Expired-source analogue of MySQL error 1236
            # (listener.go:48-51,91-110): data between wm and lo is gone.
            raise RuntimeError(
                f"source no longer covers watermark {wm} (min gtid {lo}); "
                "pass allow_gaps=True to restart from earliest available"
            )

        span = self.batch_span
        # Refuse a resume whose batch_span disagrees with the table's
        # replay history. Sub-batch ids are k*1024+segment with k =
        # gtid//span; a changed span is silently wrong in both directions:
        # a larger span regresses k, every merge falls below the
        # exactly-once guard, and the whole run no-ops while unapplied
        # events sit past the watermark (found by a randomized-interleaving
        # test); a smaller span re-enters applied gtids without the
        # within-batch filter and re-appends the overlap (audit/changelog
        # pollution). The span is RECORDED on the run's own batch commits
        # (no extra snapshot version) — never inferred: no arithmetic
        # identity over (watermark, last_batch_id) survives legitimate
        # histories, because an empty batch advances last_batch_id without
        # the watermark (review repro). A table with pre-guard history
        # gets the span recorded on its first post-upgrade run — pass the
        # original one there.
        _check_recorded_span(
            self.table.snapshot.properties.get("replay_batch_span"), span, "table")
        span_prop = {"replay_batch_span": str(span)}
        # A batch whose final segment committed recorded itself complete;
        # resume restarts at the *next* batch, else from the watermark's
        # batch (whose applied prefix replays as guarded no-ops).
        done = int(self.table.snapshot.properties.get("last_complete_batch", "-1"))
        k0 = max(lo // span, (wm // span) if wm >= 0 else 0, done + 1)

        k1 = hi // span
        total = {"batches": 0, "events": 0, "rows_inserted": 0, "rows_updated": 0,
                 "rows_deleted": 0, "ddl_applied": 0}

        def record(k: int, m: dict, wall_ms: int) -> None:
            total["batches"] += 1
            for key in ("rows_inserted", "rows_updated", "rows_deleted", "ddl_applied"):
                total[key] += m[key]
            total["events"] += m["rows_inserted"] + m["rows_updated"] + m["rows_deleted"]
            if self.lineage:
                base = {
                    "batch_id": k, "gtid_min": k * span, "gtid_max": min((k + 1) * span - 1, hi),
                    "rows_inserted": m["rows_inserted"], "rows_updated": m["rows_updated"],
                    "rows_deleted": m["rows_deleted"],
                    "rows_applied": m["rows_inserted"] + m["rows_updated"] + m["rows_deleted"],
                    "ddl_applied": m["ddl_applied"], "wall_ms": wall_ms,
                }
                rows = [dict(base, partition_id=-1)]
                # per-partition rows: files written to each bucket this batch
                rows += [
                    dict(base, partition_id=int(b), rows_applied=int(n))
                    for b, n in m.get("partitions", [])
                ]
                self.lineage.write(rows)

        ks = [k for k in range(k0, k1 + 1)]
        if max_batches is not None:
            ks = ks[:max_batches]

        def batch_df(k: int) -> DataFrame:
            return self.batch_df(stream, k)

        def sequential(k: int, ddls: list) -> None:
            t0 = time.monotonic()
            # Only a batch the source provably extends past may be marked
            # complete; the tail batch of an append-only source can still
            # grow, and resume must re-enter it (within-batch mode) rather
            # than skip it.
            m = self.applier.apply(
                batch_df(k), batch_id=k,
                final_extra_props=(
                    {} if k == k1 else {"last_complete_batch": str(k)}),
                # span rides EVERY segment commit: a crash between segments
                # of a fresh table's first DDL-segmented batch must still
                # leave the span recorded, or a changed-span resume slips
                # past the guard above (review finding)
                extra_props=span_prop,
                precollected_ddl=ddls,
                resume_within_batch=self.table.last_batch_id // 1024 == k,
            )
            record(k, m, int((time.monotonic() - t0) * 1000))

        # Windowed DDL pre-scan: one collect per ``prescan_window`` batches
        # (a JVM-side regex prefilter keeps non-DDL rows off the driver),
        # never one collect for the whole run — driver memory stays
        # O(window) on an unbounded replay.
        windows = _ddl_windows(self, stream, ks, span)

        depth = self.pipeline_depth
        can_pipeline = depth > 1 and self.applier.config.merge_mode == "mor"
        if not can_pipeline:
            for wks, ddl_by_k in windows:
                for k in wks:
                    sequential(k, ddl_by_k[k])
            total["watermark_gtid"] = self.table.watermark_gtid
            return total

        # Pipelined mode: stage (write) up to ``depth`` no-DDL batches
        # concurrently; commit strictly in batch order on this thread. A
        # DDL-bearing batch — or one needing within-batch resume — drains
        # the pipeline first and runs through the sequential path, so
        # schema evolution still segments exactly where it must. The
        # pipeline rides across window boundaries (the next window's
        # pre-scan collect runs on this thread while staged jobs proceed).
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        inflight: deque = deque()  # (k, t_submit, future)

        def commit_oldest() -> None:
            k, t0, fut = inflight.popleft()
            staged = fut.result()
            m = self.applier.commit_batch(
                staged, k,
                final_extra_props=dict(
                    span_prop,
                    **({} if k == k1 else {"last_complete_batch": str(k)})),
            )
            record(k, m, int((time.monotonic() - t0) * 1000))

        with ThreadPoolExecutor(max_workers=depth, thread_name_prefix="cdc-stage") as ex:
            for wks, ddl_by_k in windows:
                for k in wks:
                    needs_seq = bool(ddl_by_k[k]) or self.table.last_batch_id // 1024 == k
                    if needs_seq:
                        while inflight:
                            commit_oldest()
                        sequential(k, ddl_by_k[k])
                        continue
                    while len(inflight) >= depth:
                        commit_oldest()
                    inflight.append((k, time.monotonic(), ex.submit(self.applier.stage_batch, batch_df(k))))
            while inflight:
                commit_oldest()
        total["watermark_gtid"] = self.table.watermark_gtid
        return total


class CatalogReplayRunner:
    """Multi-table replay over a :class:`~..plans.catalog.LakeCatalog`.

    Same deterministic gtid-span batch planning and resume semantics as
    :class:`ReplayRunner`, but batch progress (``watermark_gtid``,
    ``last_complete_batch``) persists in *catalog* properties — the
    per-table exactly-once guards (sub-batch ids, per-table watermarks)
    make a crash-replayed batch a per-pair no-op, so a crash between the
    last table's commit and the catalog property update just replays one
    batch of guarded no-ops."""

    def __init__(
        self,
        spark: SparkSession,
        catalog,
        batch_span: int = 100_000,
        config: ApplyConfig | None = None,
        lineage_dir: str | None = None,
        pipeline_depth: int = 1,
        prescan_window: int = 256,
        partition_col: str | None = None,
        partition_span: int | None = None,
        archive_root: str | None = None,
    ):
        """``pipeline_depth`` > 1 overlaps the per-pair delta-WRITE jobs of
        up to that many consecutive DDL-free mor batches (on top of the
        within-batch pair parallelism of
        :class:`~..operators.multi.MultiTableApplier`); per-table snapshot
        commits and the catalog property update stay strictly batch-
        ordered. A batch carrying DDL — or the resume batch — drains the
        pipeline and runs the sequential path, exactly like the
        single-table runner. ``prescan_window`` bounds each DDL pre-scan
        collect to that many batches (driver memory O(window), see
        :class:`ReplayRunner`)."""
        from ..operators.multi import MultiTableApplier

        self.spark = spark
        self.catalog = catalog
        self.batch_span = batch_span
        self.applier = MultiTableApplier(catalog, config)
        self.lineage = LineageWriter(lineage_dir) if lineage_dir else None
        self.pipeline_depth = max(1, pipeline_depth)
        self.prescan_window = max(1, prescan_window)
        self.partition_col = partition_col
        self.partition_span = partition_span
        self.archive_root = archive_root
        self.max_prescan_rows = 0

    # same gtid-partitioned-archive pruning contract as ReplayRunner
    _partition_pred = ReplayRunner._partition_pred
    batch_df = ReplayRunner.batch_df
    _bounds = ReplayRunner._bounds
    _listed_extreme_partitions = ReplayRunner._listed_extreme_partitions
    _extreme_partition_bounds = ReplayRunner._extreme_partition_bounds

    @property
    def watermark_gtid(self) -> int:
        return int(self.catalog.properties.get("watermark_gtid", "-1"))

    def run(self, stream: DataFrame, max_batches: int | None = None,
            allow_gaps: bool = False,
            bounds: tuple[int, int] | None = None) -> dict:
        # same precomputed-bounds contract as ReplayRunner.run
        if bounds is not None:
            bounds = {"lo": bounds[0], "hi": bounds[1]}
        else:
            bounds = self._bounds(stream)
        if bounds["lo"] is None:
            return {"batches": 0, "events": 0}
        lo, hi = bounds["lo"], bounds["hi"]
        wm = self.watermark_gtid
        if wm >= hi:
            return {"batches": 0, "events": 0, "clamped": True}
        if wm >= 0 and wm < lo - 1 and not allow_gaps:
            raise RuntimeError(
                f"source no longer covers watermark {wm} (min gtid {lo}); "
                "pass allow_gaps=True to restart from earliest available"
            )

        span = self.batch_span
        # Same recorded-span guard as ReplayRunner, different channel: the
        # catalog records via the O(1) PROGRESS file (up-front, before any
        # batch applies), the table on its own merge commits. The catalog
        # additionally gets the pre-guard adoption sanity below, which the
        # table cannot have (a mid-batch crash legitimately leaves table
        # sub-ids ahead of the watermark; the catalog's record() always
        # sets wm to its batch's end).
        recorded = self.catalog.properties.get("replay_batch_span")
        done = int(self.catalog.properties.get("last_complete_batch", "-1"))
        _check_recorded_span(recorded, span, "catalog")
        if recorded is None:
            # Adopting a span for a catalog with PRE-GUARD replay history
            # must not enshrine a typo: the catalog's record() always sets
            # the watermark to its batch's end, so under the true span
            # wm//span is the last applied batch and last_complete_batch
            # is that or one less (growing tail) — a span that breaks the
            # identity is provably not the one the history was built with.
            if done >= 0 and wm >= 0 and not (0 <= wm // span - done <= 1):
                raise ValueError(
                    f"cannot adopt batch_span={span} for a catalog with "
                    f"pre-guard replay history (watermark {wm} / "
                    f"last_complete_batch {done} are inconsistent with "
                    "it); pass the span the history was built with")
            # rides the O(1) PROGRESS channel (merged, durable) — a
            # registry version per run would violate the progress-channel
            # invariant the round-3 fix pinned
            self.catalog.set_progress({"replay_batch_span": str(span)})
        k0 = max(lo // span, (wm // span) if wm >= 0 else 0, done + 1)

        k1 = hi // span
        total = {"batches": 0, "events": 0, "rows_inserted": 0, "rows_updated": 0,
                 "rows_deleted": 0, "ddl_applied": 0}

        ks = list(range(k0, k1 + 1))
        if max_batches is not None:
            ks = ks[:max_batches]

        def batch_df(k: int) -> DataFrame:
            return self.batch_df(stream, k)

        def record(k: int, m: dict, wall_ms: int) -> None:
            props = {"watermark_gtid": str(min(hi, (k + 1) * span - 1))}
            if k != k1:
                # only a batch the source provably extends past is complete;
                # a growing tail batch must be re-entered on resume
                props["last_complete_batch"] = str(k)
            # O(1) progress channel: one atomically-swapped PROGRESS file,
            # not a full registry version per batch (a 10^5-batch replay
            # would otherwise leave 10^5 registry dumps; round-3 review #3)
            self.catalog.set_progress(props)
            total["batches"] += 1
            for key in ("rows_inserted", "rows_updated", "rows_deleted", "ddl_applied"):
                total[key] += m[key]
            total["events"] += m["rows_inserted"] + m["rows_updated"] + m["rows_deleted"]
            if self.lineage:
                rows = []
                for tname, tm in m["tables"].items():
                    base = {
                        "batch_id": k, "gtid_min": k * span,
                        "gtid_max": min((k + 1) * span - 1, hi),
                        "rows_inserted": tm["rows_inserted"],
                        "rows_updated": tm["rows_updated"],
                        "rows_deleted": tm["rows_deleted"],
                        "rows_applied": tm["rows_inserted"] + tm["rows_updated"] + tm["rows_deleted"],
                        "ddl_applied": tm["ddl_applied"], "wall_ms": wall_ms,
                        "table_name": tname,
                    }
                    rows.append(dict(base, partition_id=-1))
                    rows += [
                        dict(base, partition_id=int(b), rows_applied=int(n))
                        for b, n in tm.get("partitions", [])
                    ]
                self.lineage.write(rows)

        def sequential(k: int, ddls: list) -> None:
            t0 = time.monotonic()
            m = self.applier.apply(
                batch_df(k), batch_id=k,
                precollected_ddl=ddls,
                resume_within_batch=(k == k0),
            )
            record(k, m, int((time.monotonic() - t0) * 1000))

        windows = _ddl_windows(self, stream, ks, span)

        depth = self.pipeline_depth
        cfg = self.applier.config
        can_pipeline = depth > 1 and cfg.merge_mode == "mor"
        if not can_pipeline:
            for wks, ddl_by_k in windows:
                for k in wks:
                    sequential(k, ddl_by_k[k])
            total["watermark_gtid"] = self.watermark_gtid
            return total

        # Pipelined mode: stage up to ``depth`` DDL-free batches' per-pair
        # delta writes concurrently (each stage itself fans out across
        # pairs); commit (per-table snapshots + catalog props) strictly in
        # batch order on this thread. DDL batches and the resume batch
        # drain the pipeline and run sequentially.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pairs = cfg.observed_pairs()
        inflight: deque = deque()  # (k, t_submit, future -> {pair: staged})

        def commit_oldest() -> None:
            k, t0, fut = inflight.popleft()
            m = self.applier.commit_pairs(fut.result(), k)
            record(k, m, int((time.monotonic() - t0) * 1000))

        with ThreadPoolExecutor(max_workers=depth, thread_name_prefix="cdc-cstage") as ex:
            for wks, ddl_by_k in windows:
                for k in wks:
                    if ddl_by_k[k] or k == k0:
                        while inflight:
                            commit_oldest()
                        sequential(k, ddl_by_k[k])
                        continue
                    while len(inflight) >= depth:
                        commit_oldest()
                    inflight.append((k, time.monotonic(),
                                     ex.submit(self.applier.stage_pairs, batch_df(k), pairs)))
            while inflight:
                commit_oldest()
        total["watermark_gtid"] = self.watermark_gtid
        return total
