"""As-of (point-in-time) join — a time-series operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (backward; ``forward`` symmetric).  The classic
uses: joining events to slowly-changing state, feature lookups "as of"
label time (leak-free training data), trade/quote alignment.

Implementation is a **union + one shuffle** (no join node at all): tag
sides, hash-partition by key, sort each partition by (ts, side), and carry
the last non-null right value forward with an unbounded-preceding window.
Cost = one exchange + one sort — same as a single sort-merge join stage,
but with no row-multiplication risk and no range-explosion; skew follows
the key distribution exactly like any keyed shuffle (salt upstream if one
key dominates).

A naive formulation — equi-join on key + ``r.ts <= l.ts`` then max-per-left
— multiplies rows quadratically per key before aggregating; at 100 TB the
union+window form is the difference between one sort and an O(n·m)
intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "key",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_expr: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    ``value_cols`` (renamed with ``suffix``) and its timestamp as
    ``{on}{suffix}``; nulls where no right row qualifies.

    ``tolerance_expr`` (e.g. ``"INTERVAL 1 HOUR"``) drops matches farther
    than the tolerance from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by_cols, on)]

    right_ts = f"{on}{suffix}"
    val_out = {c: f"{c}{suffix}" for c in value_cols}

    # union with side tag; left-only columns null on right rows and vice versa
    left_cols = [c for c in left.columns if c not in (*by_cols, on)]
    l_tagged = left.select(
        *by_cols,
        F.col(on),
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(val_out[c]) for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias(right_ts),
        F.lit(1).alias("_side"),
    )
    r_tagged = right.select(
        *by_cols,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(val_out[c]) for c in value_cols],
        F.col(on).alias(right_ts),
        F.lit(0).alias("_side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # backward: ascending ts, right rows sort before left at equal ts so an
    # equal-timestamp right row is visible to the left row; forward mirrors.
    if direction == "backward":
        order = [F.col(on).asc(), F.col("_side").asc()]
    else:
        order = [F.col(on).desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = unioned.select(
        "*",
        *[
            F.last(F.col(col), ignorenulls=True).over(w).alias(f"_c_{col}")
            for col in (*val_out.values(), right_ts)
        ],
    )
    out = (
        carried.filter(F.col("_side") == 1)
        .drop("_side", *val_out.values(), right_ts)
        .select(
            *by_cols,
            F.col(on),
            *left_cols,
            *[F.col(f"_c_{v}").alias(v) for v in val_out.values()],
            F.col(f"_c_{right_ts}").alias(right_ts),
        )
    )
    if tolerance_expr is not None:
        delta = (
            (F.col(on) - F.col(right_ts))
            if direction == "backward"
            else (F.col(right_ts) - F.col(on))
        )
        within = F.col(right_ts).isNotNull() & (delta <= F.expr(tolerance_expr))
        out = out.select(
            *by_cols,
            F.col(on),
            *left_cols,
            *[F.when(within, F.col(v)).alias(v) for v in val_out.values()],
            F.when(within, F.col(right_ts)).alias(right_ts),
        )
    return out
