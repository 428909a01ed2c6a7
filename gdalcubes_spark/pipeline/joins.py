"""Temporal joins Spark's DataFrame API lacks as primitives.

as-of join: for every left row, the single right row with the greatest
timestamp ≤ the left timestamp within the same key — THE time-series
enrichment join (attribute events to the latest prior state, align sensor
streams, point-in-time-correct feature lookup).

Spark-first implementation — the union-window form, NOT a theta join:
tag both sides, union, and run one `last(value, ignorenulls=true)` window
per key ordered by (ts, side). Cost is ONE shuffle on the key (the same
partitioning both inputs would need anyway); a naive range self-join is
O(|L|·|R|) per key and unusable at corpus scale. DuckDB implements the
same semantics natively (ASOF JOIN), which the driver oracle uses — two
independent constructions, one answer.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str = "ts",
              right_cols: Optional[List[str]] = None, suffix: str = "_r",
              strict: bool = False) -> DataFrame:
    """Left as-of join: attach to every `left` row the latest `right` row
    with right.ts <= left.ts (or < when strict=True) and the same `on` key.
    Left rows with no prior right row keep NULLs. `right` should have at
    most one row per (key, ts): as-of at duplicate right timestamps is
    inherently ambiguous (this picks the union-order last; DuckDB's ASOF
    picks arbitrarily too) — pre-aggregate the right side to unique (key,
    ts) for deterministic results.

    Scale shape: union both sides (narrow) → ONE shuffle on the key for the
    ordered window → filter back to left rows. Shuffle volume = |L| + |R|
    rows, never a candidate cross product.

    Nullable right payloads: the carried columns are packed into ONE struct
    and window-filled atomically, so every output row's right payload comes
    from a SINGLE right row — a NULL value inside the matched right row is
    carried as NULL, never back-filled from an older right row (the semantics
    DuckDB's native ASOF JOIN has)."""
    from pyspark.sql import types as T

    rcols = right_cols or [c for c in right.columns if c not in (on, ts)]
    lcols = [c for c in left.columns if c not in (on, ts)]
    # the right payload travels as ONE struct: a per-column fill could mix
    # columns from different right rows whenever a payload value is NULL
    pay_t = T.StructType([T.StructField(c, right.schema[c].dataType) for c in rcols])
    r_tag = (right.select(on, ts, F.struct(*[F.col(c) for c in rcols]).alias("_rpay"))
             .withColumn("_side", F.lit(0)))
    for c in lcols:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    l_tag = (left.withColumn("_side", F.lit(1))
             .withColumn("_rpay", F.lit(None).cast(pay_t)))
    cols = [on, ts, "_rpay", "_side", *lcols]
    u = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    # strict=False: right rows at the same ts are visible to left rows at
    # that ts → right sorts FIRST (side 0 < 1); strict=True: they are not →
    # right sorts AFTER left rows of equal ts
    side_order = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (W.partitionBy(on).orderBy(F.col(ts).asc(), side_order)
         .rowsBetween(W.unboundedPreceding, 0))
    filled = u.withColumn("_rpay", F.last("_rpay", ignorenulls=True).over(w))
    return (filled.filter(F.col("_side") == 1)
            .select(on, ts, *[F.col("_rpay")[c].alias(f"{c}{suffix}") for c in rcols],
                    *lcols))
