"""As-of (temporal lookup) join — an operator the DataFrame API lacks,
composed from existing primitives (SURVEY-prompt category (a)): for every
left row, the single latest right row whose time <= the left row's time,
per key.

The naive formulation — non-equi join on (key, right_ts <= left_ts) + a
per-left-row max — explodes to |left|×|matching rights| intermediate rows
and at 100 TB is a broadcast-nested-loop disaster. This composition is the
scalable one:

  union both sides tagged → ONE shuffle on the key → per-key ordered window
  → ``last(right payload, ignorenulls=True)`` carries the most recent right
  values forward onto each left row.

Work is O((|L|+|R|) log partition) with no intermediate blow-up, and the
single partitioning is reused by both the sort and the window. Ties
(right_ts == left_ts) match, like DuckDB's ASOF JOIN (the oracle for the
harness query) and pandas merge_asof's default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (sorts first on ties → inclusive match)
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: ``left``'s columns plus, per right value column,
    ``<col><suffix>`` holding the value from the latest right row at or
    before the left row's time (NULL when no right row precedes it).

    ``tolerance_seconds`` mirrors pandas ``merge_asof(tolerance=...)``:
    a match older than the tolerance is nulled out (the latest preceding
    right row IS the closest one, so "latest within the window" and
    "latest, if within the window" coincide). Implemented by carrying the
    matched right timestamp through the same window — no extra shuffle."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    overlap = set(right_value_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right value columns {sorted(overlap)} collide with left columns; "
            "rename or pass right_value_cols explicitly"
        )
    # the OUTPUT names must be fresh too: a left column literally named
    # '<col><suffix>' would silently duplicate in the result schema and
    # break later by-name selection (ADVICE r04)
    out_clash = {f"{c}{suffix}" for c in right_value_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"generated as-of output columns {sorted(out_clash)} collide "
            "with existing left columns; choose a different suffix"
        )

    l_tagged = left.select(
        *on,
        F.col(left_time).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_value_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in on
        ],
        *[F.col(c) for c in right_value_cols],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry (timestamp, value) TOGETHER per value column: the tolerance
    # gate must test the timestamp of the row that actually supplied the
    # carried value — a separate last-right-timestamp column would let a
    # NEWER null-valued right row vouch for an older, stale value
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(
                F.when(
                    (F.col(_SIDE) == 0) & F.col(c).isNotNull(),
                    F.struct(F.col(_TS).alias("t"), F.col(c).alias("v")),
                ),
                ignorenulls=True,
            )
            .over(w)
            .alias(f"__asof_sv_{c}")
            for c in right_value_cols
        ],
    )
    if tolerance_seconds is None:
        def value_of(c: str) -> F.Column:
            return F.col(f"__asof_sv_{c}")["v"]
    else:
        horizon = F.col(_TS) - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )

        def value_of(c: str) -> F.Column:
            sv = F.col(f"__asof_sv_{c}")
            return F.when(sv["t"] >= horizon, sv["v"])

    carried = carried.select(
        # internal names never collide with user columns ending in suffix
        *[c for c in carried.columns if not c.startswith("__asof_sv_")],
        *[value_of(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    left_cols = [c for c in left.columns]
    return (
        carried.filter(F.col(_SIDE) == 1)
        .select(
            *on,
            F.col(_TS).alias(left_time),
            *[c for c in left_cols if c not in on and c != left_time],
            *[f"{c}{suffix}" for c in right_value_cols],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each left row takes the right row with the smallest
    |Δt| in either direction; exact-distance ties go to the backward
    (earlier) row, like pandas. Same union + window composition as the
    backward join — one shuffle on the key, two window passes over the
    SAME partitioning (ascending for the backward candidate, descending
    for the forward one), no non-equi join anywhere."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    overlap = set(right_value_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right value columns {sorted(overlap)} collide with left columns; "
            "rename or pass right_value_cols explicitly"
        )
    # the OUTPUT names must be fresh too: a left column literally named
    # '<col><suffix>' would silently duplicate in the result schema and
    # break later by-name selection (ADVICE r04)
    out_clash = {f"{c}{suffix}" for c in right_value_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"generated as-of output columns {sorted(out_clash)} collide "
            "with existing left columns; choose a different suffix"
        )
    l_tagged = left.select(
        *on,
        F.col(left_time).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c not in on],
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(c)
            for c in right_value_cols
        ],
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in on
        ],
        *[F.col(c) for c in right_value_cols],
    )
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*on).orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*on).orderBy(F.col(_TS).desc(), F.col(_SIDE).asc())
        .rowsBetween(*frame)
    )

    def sv(c: str, w) -> F.Column:
        return F.last(
            F.when(
                (F.col(_SIDE) == 0) & F.col(c).isNotNull(),
                F.struct(F.col(_TS).alias("t"), F.col(c).alias("v")),
            ),
            ignorenulls=True,
        ).over(w)

    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[sv(c, w_back).alias(f"__b_{c}") for c in right_value_cols],
        *[sv(c, w_fwd).alias(f"__f_{c}") for c in right_value_cols],
    )

    def nearest(c: str) -> F.Column:
        b, fw = F.col(f"__b_{c}"), F.col(f"__f_{c}")
        d_b = F.col(_TS).cast("double") - b["t"].cast("double")
        d_f = fw["t"].cast("double") - F.col(_TS).cast("double")
        return (
            F.when(b.isNull(), fw["v"])
            .when(fw.isNull(), b["v"])
            .when(d_f < d_b, fw["v"])  # ties (d_f == d_b) keep backward
            .otherwise(b["v"])
        )

    left_cols = [c for c in left.columns]
    return carried.filter(F.col(_SIDE) == 1).select(
        *on,
        F.col(_TS).alias(left_time),
        *[c for c in left_cols if c not in on and c != left_time],
        *[nearest(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
