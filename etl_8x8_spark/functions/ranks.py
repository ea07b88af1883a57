"""Distributed global ranking — the histogram-prune rank.

A global ``row_number()/ntile()/running-sum`` window (``Window.orderBy``
with no partition) serializes the whole relation into ONE task. Fine
for a 25-row rollup; wrong for anything whose cardinality grows with
data volume (customers, parts, documents). The 10x sweeps measured the
disease directly: ``agg_weighted_median``'s naive form ran 8.3x at 10x
data because 3 window keys capped parallelism at 3.

This module generalizes the fix ``agg_weighted_median`` proved
(SURVEY.md §2b "histogram-prune"): bucket the ordering column into B
equal-width buckets (bucket id is MONOTONE in the ordering column, and
equal values always share a bucket), compute per-bucket counts/sums
with one map-side-combined aggregate, turn those <=B rows into
per-bucket offsets with a window over the TINY bucket relation, then
rank WITHIN each bucket in parallel (``Window.partitionBy(bucket)``).

    global row_number  = bucket offset + within-bucket row_number
    global running sum = bucket sum offset + within-bucket running sum

Both are EXACT (not approximations): bucket boundaries only partition
the sort, they never reorder it. Parallelism becomes min(B, distinct
buckets) instead of 1, and each task sorts ~N/B rows. At 100 TB raise
``buckets``; the bucket-offset window stays a <=B-row single task
either way.

``ntile_from_rank`` closes the loop for quantile scoring: Spark's
``ntile(t)`` is a pure function of (row_number, n, t) — first
``n % t`` tiles get ``ceil(n/t)`` rows, the rest ``floor(n/t)`` — so
an exact distributed row_number gives an exact distributed ntile with
no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default bucket count: 1024-way parallelism upper bound, 1024-row
#: offset relation. Raise at higher SF (cost is only the tiny window).
DEFAULT_BUCKETS = 1024


def histogram_global_rank(
    df: DataFrame,
    value: str,
    tiebreaks: list[str],
    *,
    descending: bool = False,
    buckets: int = DEFAULT_BUCKETS,
    cumsum: str | None = None,
    rank_col: str = "i",
    total_col: str = "n",
    cumsum_col: str = "cum",
    cumsums: list[str] | None = None,
) -> DataFrame:
    """Add an EXACT global ``row_number`` over ``(value [DESC],
    *tiebreaks ASC)`` — and optionally an exact running sum of
    ``cumsum`` in that order — without a single-task global window.

    Returns ``df`` plus ``rank_col`` (1-based long), ``total_col``
    (long row count) and, if ``cumsum`` is given, ``cumsum_col``
    (running sum of ``cumsum`` through the current row, same dtype
    arithmetic as ``sum``). ``cumsums`` adds further running sums in
    the same order, one column ``cum_<name>`` per listed column — all
    share the one bucket aggregate and the one partitioned window.

    The ordering must be total: ``tiebreaks`` must make (value,
    *tiebreaks) unique for deterministic output (same contract as
    every rank window in this repo). ``value`` must be numeric and
    non-null.
    """
    mnc, mxc, bcol = "_hr_mn", "_hr_mx", "_hr_b"
    stats = df.agg(
        F.min(value).alias(mnc), F.max(value).alias(mxc)
    )
    j = df.crossJoin(F.broadcast(stats))
    width = (F.col(mxc).cast("double") - F.col(mnc).cast("double")) / F.lit(
        float(buckets)
    )
    # Equal values always share a bucket (same double -> same floor),
    # and the index is monotone in value, so bucket order == sort
    # order across buckets. width<=0 (constant column) degrades to one
    # bucket — semantically exact, single-task, same as the naive form.
    bidx = (
        F.when(width <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col(value).cast("double") - F.col(mnc).cast("double"))
                    / width
                ),
                F.lit(buckets - 1),
            )
        )
        .cast("int")
    )
    j = j.withColumn(bcol, bidx).drop(mnc, mxc)

    pairs = ([(cumsum, cumsum_col)] if cumsum is not None else []) + [
        (c, f"cum_{c}") for c in (cumsums or [])
    ]
    aggs = [F.count("*").alias("_hr_cnt")] + [
        F.sum(src).alias(f"_hr_bs{k}") for k, (src, _) in enumerate(pairs)
    ]
    bstats = j.groupBy(bcol).agg(*aggs)
    # Offsets: window over <=`buckets` rows — a bounded single task by
    # construction, independent of data volume. This DOES log Spark's
    # "No Partition Defined" warning, but over a relation whose size
    # is fixed by `buckets`, not by the data (a constant partition key
    # doesn't silence it: Catalyst folds foldable keys out of the
    # partition spec).
    border = F.col(bcol).desc() if descending else F.col(bcol).asc()
    wone = Window.partitionBy()
    woff = (
        wone.orderBy(border)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = [
        bcol,
        (F.sum("_hr_cnt").over(woff) - F.col("_hr_cnt")).alias("_hr_coff"),
        F.sum("_hr_cnt").over(wone).alias("_hr_n"),
    ]
    for k in range(len(pairs)):
        sel.append(
            (F.sum(f"_hr_bs{k}").over(woff) - F.col(f"_hr_bs{k}")).alias(
                f"_hr_soff{k}"
            )
        )
    offsets = bstats.select(*sel)
    j = j.join(F.broadcast(offsets), bcol)

    vorder = F.col(value).desc() if descending else F.col(value).asc()
    win = Window.partitionBy(bcol).orderBy(
        vorder, *[F.col(t).asc() for t in tiebreaks]
    )
    out = j.withColumn(
        rank_col,
        (F.col("_hr_coff") + F.row_number().over(win)).cast("long"),
    ).withColumn(total_col, F.col("_hr_n").cast("long"))
    drop = [bcol, "_hr_coff", "_hr_n"]
    wrun = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for k, (src, outcol) in enumerate(pairs):
        out = out.withColumn(
            outcol, F.col(f"_hr_soff{k}") + F.sum(src).over(wrun)
        )
        drop.append(f"_hr_soff{k}")
    return out.drop(*drop)


def ntile_from_rank(i: Column, n: Column, t: int) -> Column:
    """Exact ``ntile(t)`` from a 1-based global row_number ``i`` and
    total count ``n`` — Spark/DuckDB ntile semantics: the first
    ``n % t`` tiles hold ``ceil(n/t)`` rows, the rest ``floor(n/t)``.

    Pure integer arithmetic on longs (floor-div via (a - a%b)/b so no
    float path), returns int. Divisor guarded for the n < t case
    (where every row falls in the first branch anyway).
    """

    def idiv(a: Column, b: Column) -> Column:
        return ((a - a % b) / b).cast("long")

    q = idiv(n, F.lit(t))
    r = (n % t).cast("long")
    cut = r * (q + 1)
    return (
        F.when(i <= cut, F.lit(1) + idiv(i - 1, q + 1))
        .otherwise(F.lit(1) + r + idiv(i - 1 - cut, F.greatest(q, F.lit(1))))
        .cast("int")
    )
