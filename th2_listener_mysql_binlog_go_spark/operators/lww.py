"""Last-writer-wins dedup (SURVEY.md §2, "needed by our engine").

The reference guarantees a total order over changes via (name, pos)
(/root/reference/README.md:62, listener.go:325-332); replaying a batch
into a table therefore reduces to keeping, per key, the change with the
maximal GTID. Expressed as a Catalyst window — one shuffle by key, then a
streaming rank inside each partition; AQE splits skewed key-hash
partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "gtid",
    keep_order_col: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the last writer (max ``order_col``, then ``tiebreak_cols``)
    per ``key_cols``.

    Resolution is on the *final* op per key: a DELETE→INSERT resurrection
    sequence collapses to the INSERT, never a naive max-per-column blend
    (SURVEY.md §7 hard part (b)). ``tiebreak_cols`` carries the within-gtid
    sub-order — (log_pos, row_idx) in the reference's (name, pos, seq)
    total order (README.md:62-63) — for streams where one transaction
    (GTID) holds several changes to the same key.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(),
        *[F.col(c).desc() for c in (tiebreak_cols or [])],
    )
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return out if keep_order_col else out.drop(order_col)
