"""Scalable exact global rank — the shared two-phase recipe.

A bare ``row_number() OVER (ORDER BY score)`` moves the ENTIRE input
through one ``Exchange SinglePartition`` into a single Window task —
correct, and fatal at corpus scale (one straggler sorting the whole
relation). ``sort_order_audit`` (operators/relational.py) solved this
when a natural leading partition key exists (rank within the leading
key, add broadcast cumulative offsets). This module generalizes the
recipe to rank orders whose leading key is a *numeric score with no
reusable partitioning*: manufacture the leading key.

Phase 0 — one bounded aggregate computes ``n_buckets - 1`` approximate
percentile cutpoints of the score (``percentile_approx``; the cutpoint
VALUES only steer bucket balance, never the answer). Phase 1 — a
scan-side expression assigns each row ``bucket = |{cuts c : score < c}|``
— a pure function of the score value, so (a) equal scores always share
a bucket and (b) for a DESCENDING rank, ``score_a > score_b ⇒
bucket_a ≤ bucket_b``: bucket order is consistent with the sort order.
Phase 2 — ``row_number`` within each bucket (a partitioned window — the
shuffle key is the bucket), plus each bucket's exclusive cumulative row
count from a ``n_buckets``-row aggregate (its global window is dim-sized
and sits directly above the Aggregate), broadcast back. ``global rn =
offset + within-bucket rn`` — EXACTLY the single-window row_number,
because bucketing is a coarsening of the total order.

Degenerate input (every score identical) collapses to one bucket — the
same single task as the naive plan, but only when the DATA is a single
equivalence class; any real score distribution spreads across buckets.
Scores must be non-NULL (both registered consumers aggregate counts,
which cannot be NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scored_global_rank(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 64,
    rn_name: str = "rn",
    total_name: str | None = None,
) -> DataFrame:
    """Stamp ``rn_name`` = exact global ROW_NUMBER() under
    ``ORDER BY score_col DESC, id_col ASC`` without an unpartitioned
    data-scale Window (module docstring has the proof sketch).

    ``df`` is consumed twice (cutpoint aggregate + the ranked pass) —
    callers pass an already-checkpointed or cheap-to-recompute frame.
    ``total_name``, when given, also attaches the total row count
    (taken from the same bucket-count relation — no extra pass).
    The cutpoint collect is k-row bounded (``n_buckets - 1`` values —
    the model, not the data)."""
    from pyspark.sql import Window

    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(score_col, qs, 10000).alias("c")
    ).collect()[0]["c"]
    cuts = sorted(set(row)) if row else []
    if cuts:
        bkt = F.size(
            F.filter(
                F.lit(cuts), lambda c: F.col(score_col) < c
            )
        )
    else:
        bkt = F.lit(0)
    b = df.withColumn("__bkt", bkt.cast("int"))
    w_in = Window.partitionBy("__bkt").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    # |buckets|-row relation; its global window is dim-sized by
    # construction (sits directly above the Aggregate).
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (
        b.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(F.sum("__n").over(w_off), F.lit(0)).cast("bigint"),
        )
    )
    keep = ["__bkt", "__off"]
    if total_name is not None:
        w_tot = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off = off.withColumn(
            total_name, F.sum("__n").over(w_tot).cast("bigint")
        )
        keep.append(total_name)
    return (
        b.join(F.broadcast(off.select(*keep)), "__bkt")
        .withColumn(
            rn_name,
            (F.col("__off") + F.row_number().over(w_in)).cast("bigint"),
        )
        .drop("__bkt", "__off")
    )
