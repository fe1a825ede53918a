"""Update pairing over flat alternating rows (operator S5).

MySQL UPDATE_ROWS binlog events carry alternating before/after rows; the
reference pairs them positionally — even index = Before, odd = After
(/root/reference/component/bean/bean.go:164-181). When such rows arrive
flat (one row each), the Spark-native pairing is a ranked window + lead:
one shuffle by event key, pairs emitted per partition. A trailing
unpaired row is dropped (the reference only ever receives full pairs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_alternating(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """-> part_cols + pair_idx + before_<c>/after_<c> for each payload col."""
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_next", F.lead(order_col).over(w)  # pair-completeness marker, null-safe
    )
    for c in payload_cols:
        ranked = ranked.withColumn(f"after_{c}", F.lead(c).over(w))
    return ranked.filter((F.col("_rn") % 2 == 1) & F.col("_next").isNotNull()).select(
        *part_cols,
        ((F.col("_rn") - 1) / 2).cast("bigint").alias("pair_idx"),
        *[F.col(c).alias(f"before_{c}") for c in payload_cols],
        *[F.col(f"after_{c}") for c in payload_cols],
    )
