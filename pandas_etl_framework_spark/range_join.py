"""Range (interval-containment) join — point-in-interval matching without
the nested loop Spark plans for a bare inequality condition.

``left`` carries point timestamps, ``right`` carries [start, end] intervals
per key. The naive ``ON key = key AND point BETWEEN start AND end`` gives
Catalyst only an equi-part on the key: with hot keys (or no key) it
degenerates to per-key cross products. The bucketized composition turns the
inequality into an equi-join:

  1. explode each interval into the fixed-width time buckets it covers,
  2. equi-join on (key, bucket) — hash join, shuffle on both sides,
  3. re-check the exact BETWEEN as a residual filter.

Bucket width trades replication (long intervals explode into more buckets)
against join selectivity; pick it near the median interval length. Work is
O(|L| + Σ interval_len/bucket) — no cross product at any key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join left points into right intervals per key (inclusive bounds).

    Output: left columns + right's non-key columns. ``how='inner'`` keeps
    matched points; ``'left'`` keeps unmatched points with NULL interval
    columns.
    """
    point_bucket = F.floor(F.col(point_col).cast("double") / bucket_seconds)
    start_bucket = F.floor(F.col(start_col).cast("double") / bucket_seconds)
    end_bucket = F.floor(F.col(end_col).cast("double") / bucket_seconds)

    l_b = left.withColumn(_BUCKET, point_bucket.cast("long"))
    r_b = right.withColumn(
        _BUCKET,
        F.explode(F.sequence(start_bucket.cast("long"), end_bucket.cast("long"))),
    )
    joined = l_b.join(r_b, on=on + [_BUCKET], how="inner").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    out_cols = left.columns + [c for c in right.columns if c not in on]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    if how == "left":
        unmatched = left.join(
            matched.select(*left.columns), on=left.columns, how="left_anti"
        )
        for c in right.columns:
            if c not in on:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(right.dtypes)[c])
                )
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how: {how}")
