"""Generic as-of join — the temporal-lookup operator Spark lacks natively.

Semantics (backward, inclusive): for each left row, attach the payload of the
LAST right row of the same `by` group whose `on` value is <= the left row's
(pandas.merge_asof / kdb aj semantics). The telemetry pipeline uses it to
attach "most recent prior view/tool state" to error and claim records
(events_error_gap is the same-table special case; this module is the
two-table general form).

Two implementations, pinned equal by test:

  * ``asof_join`` — union-tag + one window, entirely JVM-side: tag each side,
    union, and take last_value(payload) IGNORE NULLS over the per-group
    running frame ordered by (on, side_tag). This is the SCALE PATH: one
    exchange on `by`, one sort, streaming frame state of exactly one payload —
    never a range join, never per-key buffering of whole groups. Right rows
    sort BEFORE left rows at equal `on` (side_tag 0 < 1), which is what makes
    the match inclusive.
  * ``asof_join_pandas`` — cogroup + pandas.merge_asof per `by` group (Arrow
    batches, no per-row Python). The readable cross-check twin; also the
    escape hatch for asof variants SQL can't express (nearest/tolerance).
    Buffers one group per call, so unlike the window form it is exposed to
    mega-group skew — that is why the union form is the registered path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    payload: str = "value",
    out_col: str = "asof_value",
) -> DataFrame:
    """Backward-inclusive as-of join; returns `left` columns + `out_col`."""
    lcols = left.columns
    lt = left.select(*lcols, F.lit(1).alias("_side"), F.lit(None).cast(
        right.schema[payload].dataType
    ).alias("_payload"))
    rt = right.select(
        by,
        on,
        F.lit(0).alias("_side"),
        F.col(payload).alias("_payload"),
    )
    # unionByName fills left-only columns with nulls on the right side
    u = lt.unionByName(rt, allowMissingColumns=True)
    # `_payload` as the final sort key pins the tie among right rows sharing
    # one timestamp (last = max payload) — without it the carried value is
    # whichever duplicate happens to sort last, i.e. nondeterministic.
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_side", "_payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*lcols, out_col)
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    payload: str = "value",
    out_col: str = "asof_value",
) -> DataFrame:
    """Same semantics via cogroup + pandas.merge_asof (Arrow-batched)."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(out_col, right.schema[payload].dataType)]
    )
    lcols = left.columns

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=lcols + [out_col])
        lpdf = lpdf.sort_values(on, kind="mergesort")
        # secondary sort on payload: merge_asof takes the positionally-last
        # right row at an equal timestamp, so this matches the window form's
        # (on, side, payload) tie-break exactly
        r = rpdf[[on, payload]].sort_values([on, payload], kind="mergesort")
        merged = pd.merge_asof(
            lpdf, r.rename(columns={payload: out_col}), on=on, direction="backward"
        )
        return merged[lcols + [out_col]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )
