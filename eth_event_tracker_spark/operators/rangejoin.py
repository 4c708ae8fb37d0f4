"""Range (interval) join — match point rows to interval rows with
``start <= point < end`` — as a *binned equality join*.

Spark has no native range join (Databricks' range-join hint is not in
OSS Spark).  The naive encoding — ``points JOIN intervals ON point >=
start AND point < end`` — has no equality key, so Catalyst plans a
BroadcastNestedLoopJoin (driver-sized intervals only) or an outright
CartesianProduct: O(|points| x |intervals|) comparisons, dead at scale.

This operator is the standard bin-and-refine decomposition (the same
trick DuckDB's IEJoin paper and Databricks' range join exploit,
re-expressed in plain DataFrame ops):

    points    → bin = floor(epoch(point) / W)          (1 row, its bin)
    intervals → explode sequence(bin(start), bin(end)) (1 row per covered bin)
    equality join on bin                               (shuffle on bin key)
    refine with the exact predicate                    (row-local filter)

Each point lives in exactly ONE bin, so a (point, interval) pair meets
at most once — no post-join dedup.  Cost: the interval side replicates
by ceil(len/W)+1; pick ``bin_width`` on the order of the TYPICAL
interval length so the blow-up is a small constant while each bin pairs
only temporally-near rows.  The join itself is a plain shuffled equality
join — AQE can split skewed bins (a hot time range) like any other key.

The operator is deliberately inner-only: "keep empty intervals" is an
aggregation-shape concern (join the aggregate back onto the interval
table by its key), and doing it here would force a post-join dedup of
the bin-replicated interval side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start_ts <= point_ts < end_ts`` (half-open, the time-window
    convention), without ever forming a cross product.

    ``bin_width`` is in seconds.  Column sets must be disjoint; the
    output carries all columns of both inputs."""
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"binned_interval_join: overlapping columns {sorted(clash)}")
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("binned_interval_join: '_bin' is reserved")
    w = int(bin_width)
    if w <= 0:
        raise ValueError("binned_interval_join: bin_width must be positive seconds")
    p = points.withColumn("_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / w))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / w),
                F.floor(F.unix_timestamp(F.col(end_ts)) / w),
            )
        ),
    )
    refine = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    return p.join(iv, on="_bin", how="inner").where(refine).drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join interval rows that OVERLAP: ``l_start < r_end AND
    r_start < l_end`` (half-open on both sides) — the two-sided
    generalization of :func:`binned_interval_join`, still never a cross
    product.

    Both sides explode to their covered bins and meet by bin equality.
    Unlike the point case, an overlapping pair can now share SEVERAL
    bins; the standard dedup-free trick keeps a pair only in the ONE
    bin containing ``greatest(l_start, r_start)`` — the first bin where
    both intervals are live — so no post-join distinct over the
    replicated rows is needed.  Replication factor is ceil(len/W)+1 per
    side; pick W near the typical interval length."""
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"interval_overlap_join: overlapping columns {sorted(clash)}")
    for c in ("_bin", "_lbin", "_rbin"):
        if c in left.columns or c in right.columns:
            raise ValueError(f"interval_overlap_join: {c!r} is reserved")
    w = int(bin_width)
    if w <= 0:
        raise ValueError("interval_overlap_join: bin_width must be positive seconds")

    def bins(df, start, end):
        lo = F.floor(F.unix_timestamp(F.col(start)) / w)
        # half-open end: an interval touching a bin boundary exactly does
        # not extend into that bin
        hi = F.floor((F.unix_timestamp(F.col(end)) - 1) / w)
        return df.withColumn("_bin", F.explode(F.sequence(lo, F.greatest(lo, hi))))

    l = bins(left, l_start, l_end)
    r = bins(right, r_start, r_end)
    joined = l.join(r, "_bin")
    meet_bin = F.floor(
        F.greatest(F.unix_timestamp(F.col(l_start)), F.unix_timestamp(F.col(r_start))) / w
    )
    overlap = (F.unix_timestamp(F.col(l_start)) < F.unix_timestamp(F.col(r_end))) & (
        F.unix_timestamp(F.col(r_start)) < F.unix_timestamp(F.col(l_end))
    )
    return joined.where(overlap & (F.col("_bin") == meet_bin)).drop("_bin")
