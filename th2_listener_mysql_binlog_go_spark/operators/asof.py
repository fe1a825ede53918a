"""AS-OF (temporal / point-in-time) join over a CDC event log.

Given a probe set ``(key..., as_of_gtid)`` and the table's retained
change-event log (``LakeTable.events_log``), return for every probe the
row image that was CURRENT as of that position: the event with the
largest ``(_gtid, _seq) <= (as_of_gtid, +inf)`` for that key — inclusive
of events AT the probe position, ``DELETE`` yielding "no live image".
This is the point-in-time-correct feature join a training pipeline runs
(label at time t joins features as of t, never after — no leakage), and
the reference's downstream consumers reconstruct exactly this by
replaying a key's events up to a position (listener.go:296-315).

Plan shape (the reason this is NOT a range join): tag events and probes,
union them, and run ONE window per key ordered by ``(position,
side, _seq)`` carrying ``last(image, ignorenulls=True)`` — every probe
row picks up the latest preceding event image in a single pass.

- ONE hash exchange total — the union flows through a single
  key-hash shuffle into the window (pinned by a plan test: 1 Exchange,
  0 join nodes) — no O(probes x versions) inequality-join blowup, no
  per-probe jobs;
- cost is O((events + probes) log) per key group, independent of how
  far back probes reach;
- at 100 TB the events side prunes to the PROBED buckets when the probe
  keyset is small (``LakeTable.asof_join`` reuses ``lookup_many``'s
  bucket math), and to ``gtid <= max(as_of_gtid)`` via the commit-level
  gtid envelopes when a position bound is passed.

Correctness window (same disclosure as ``LakeTable.key_history``): the
log retains one row per applied change event SINCE each bucket was last
folded (compaction / CoW rewrite); a folded prefix survives as a single
``KEEP`` row at its original ``(_gtid, _seq)``. A probe BELOW a key's
fold point therefore finds no image even though the key existed — run
audit/training reads against a retention replay
(``ApplyConfig(auto_compact_deltas=None)``) or probe at-or-after the
fold. Rows at or below a TRUNCATE marker are dead table-wide, matching
``read()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.lake import GTID_COL, OP_COL, SEQ_COL

_MATCH_GTID = "_match_gtid"
_MATCH_OP = "_match_op"


def asof_join(
    events: DataFrame,
    probes: DataFrame,
    key_cols: list[str],
    pos_col: str = "as_of_gtid",
    how: str = "left",
) -> DataFrame:
    """Join every probe row to the event image current as of its position.

    ``events``: key columns + payload columns + ``(_gtid, _seq, _op)``
    (the shape ``LakeTable.events_log`` returns). ``probes``: key columns
    + ``pos_col`` (castable to bigint) + any carry-through columns; probe
    column names must not collide with event payload names (alias on the
    probe side — the match comes out under the event's own names).

    Output: every probe column, the event payload columns (NULL when no
    live image), ``_match_gtid``/``_match_op`` — ``_match_op`` is NULL
    when the key had no retained event at or before the position and
    ``'DELETE'`` when the last one was a delete (so "never existed" and
    "deleted as of then" stay distinguishable); ``_match_gtid`` is the
    matched image's position, NULL in both no-image cases.

    ``how='left'`` keeps unmatched probes with NULL images; ``'inner'``
    keeps only probes with a live image.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    meta = {GTID_COL, SEQ_COL, OP_COL, "_bucket"}
    payload = [c for c in events.columns
               if c not in key_cols and c not in meta]
    clash = (set(probes.columns) - set(key_cols)) & set(payload)
    if clash:
        raise ValueError(
            f"probe columns {sorted(clash)} collide with event payload "
            "columns; alias them on the probe side")
    if pos_col not in probes.columns:
        raise ValueError(f"probes lack position column {pos_col!r}")
    reserved = {"_g", "_t", "_s", "_img", "_st",
                _MATCH_GTID, _MATCH_OP} & set(probes.columns)
    if reserved:
        raise ValueError(
            f"probe columns {sorted(reserved)} collide with asof_join "
            "internals; alias them on the probe side")
    carry = [c for c in probes.columns if c not in key_cols]

    # One unified relation: events tagged _t=0 carrying their image as a
    # struct, probes tagged _t=1 carrying their own columns. At an equal
    # position the event sorts FIRST (inclusive as-of), and events at one
    # position order by _seq so the window's last() lands on the
    # max-(gtid, seq) image — the same LWW total order the lake persists.
    img = F.struct(
        F.col(OP_COL).alias("op"), F.col(GTID_COL).alias("g"),
        *[F.col(c).alias(c) for c in payload],
    )
    ev = events.select(
        *key_cols,
        F.col(GTID_COL).cast("bigint").alias("_g"),
        F.col(SEQ_COL).cast("bigint").alias("_s"),
        F.lit(0).alias("_t"),
        img.alias("_img"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in carry],
    )
    pr = probes.select(
        *key_cols,
        F.col(pos_col).cast("bigint").alias("_g"),
        F.lit(None).cast("bigint").alias("_s"),
        F.lit(1).alias("_t"),
        F.lit(None).cast(ev.schema["_img"].dataType).alias("_img"),
        *carry,
    )
    w = (Window.partitionBy(*[F.col(k) for k in key_cols])
         .orderBy(F.col("_g").asc(), F.col("_t").asc(),
                  F.col("_s").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    st = F.last("_img", ignorenulls=True).over(w)
    out = (ev.unionByName(pr)
           .withColumn("_st", st)
           .filter(F.col("_t") == 1))
    live = F.col("_st").isNotNull() & (F.col("_st")["op"] != "DELETE")
    if how == "inner":
        out = out.filter(live)
    sel = [F.col(k) for k in key_cols]
    sel += [F.col(c) for c in carry]
    sel += [F.when(live, F.col("_st")[c]).alias(c) for c in payload]
    sel += [
        F.when(live, F.col("_st")["g"]).alias(_MATCH_GTID),
        F.col("_st")["op"].alias(_MATCH_OP),
    ]
    return out.select(*sel)
