"""Point-in-time (as-of) join — the time-series operator Spark's DataFrame
API lacks natively (pandas has ``merge_asof``; DuckDB has ``ASOF JOIN``).

For each left row, attach the value of the most recent right row with
``right.ts <= left.ts`` within the same key (ties at equal timestamps
include the right row, matching ``<=``).

Scale plan — the union + running-window form, NOT an inequality join:

* A naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + argmax makes
  Spark pick a sort-merge/broadcast-nested-loop RANGE join whose per-key
  cost is O(|l_k| × |r_k|) — quadratic in the hot keys, the classic
  skew bomb at 10^12 rows.
* Here both sides are tagged, unioned on the narrow (key, ts, side,
  value) projection, and a single running ``last(value, ignorenulls)``
  window per key picks each left row's latest preceding right value:
  ONE hash shuffle on the key, one sort per partition, O((|l|+|r|)
  log …) total — the same shape a windowed aggregation already costs.
* Left payload columns ride through as ONE struct column, so arbitrary
  left schemas need no per-column null-branching in the union.

Rows whose key has no preceding right row keep a NULL as-of value (the
LEFT-join semantic).  NULL handling matches the reference engines
(DuckDB native ASOF, pandas ``merge_asof``): a matched right row whose
VALUE is null yields null (it does not fall back to an older mark),
right rows with a NULL timestamp OR a NULL key match nothing — equality
join keys never match on NULL, so NULL-key right rows are dropped
before the union and NULL-key left rows come back with a NULL as-of
value — and left rows with a NULL timestamp match nothing.  The right
side must be
unique per (key, ts) —
equal-timestamp duplicates make "the" latest value ambiguous in every
engine; pre-aggregate (e.g. ``groupBy(key, ts).max(value)``) when the
source can carry duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """left ⟕asof right: every left row + the latest right ``right_value``
    at-or-before its timestamp, per ``key``.  Output = all left columns +
    ``out_col`` (default ``asof_<right_value>``)."""
    out_col = out_col or f"asof_{right_value}"
    if out_col in left.columns:
        raise ValueError(
            f"asof_join output column {out_col!r} already exists on the left "
            "frame; pass out_col= to disambiguate"
        )
    rv_type = right.schema[right_value].dataType
    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts → <=
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        # the right-row marker struct stays NULL on left rows; on right rows
        # it is non-null even when the VALUE is null, so last(ignorenulls)
        # tracks "latest right ROW" — a matched NULL value stays NULL
        # instead of resurrecting an older mark (ASOF semantics)
        F.lit(None).cast(f"struct<v:{rv_type.simpleString()}>").alias("_r"),
    )
    r2 = right.filter(
        F.col(right_ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        # a NULL right timestamp satisfies no `r.ts <= l.ts` predicate in
        # any engine; dropping it here also keeps it from sorting NULLS
        # FIRST and spuriously matching every left row.  A NULL right KEY
        # is dropped too: Window.partitionBy groups NULLs together, which
        # would hand NULL-key left rows an as-of match that no equality
        # join would ever produce
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        F.struct(F.col(right_value).alias("v")).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l2.unionByName(r2)
        .withColumn(out_col, F.last("_r", ignorenulls=True).over(w)["v"])
        .filter(F.col("_side") == 1)
        .select("_l.*", out_col)
    )
