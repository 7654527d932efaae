"""Top-1-per-group / lateral-join rewrites.

The reference's hardest workload operator is ``LEFT JOIN LATERAL … ORDER BY …
LIMIT 1`` (reference: models/classified_card_transactions.sql:126-147 regex
best-match, :157-184 name-containment best-match) and the window-based
mapping dedup (:211-217). Spark has no LATERAL LIMIT 1; the scalable rewrite
is: produce candidate pairs with a (broadcast) join, then keep the best
candidate per left row with a ranking window.

Scale notes (100 TB): the left side stays partitioned by its own key — the
window partitions by the left row key, so the shuffle is one hash exchange on
a high-cardinality key (no skew); the candidate dimension is broadcast, so no
shuffle of the big side for the join itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    rank_col: str = "__rn",
) -> DataFrame:
    """Keep the single best row per group (``row_number() = 1``).

    Reference parity: models/classified_card_transactions.sql:211-217 —
    ``row_number() over (partition by merchant_key order by is_default desc,
    effective_from desc nulls last, account_id desc)``. Callers must supply a
    total order (include a unique tiebreak) for deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def lateral_top1_join(
    left: DataFrame,
    right: DataFrame,
    *,
    match: Column,
    order_by: Sequence[Column],
    left_key: Sequence[str],
    how: str = "left",
    broadcast_right: bool = True,
) -> DataFrame:
    """``LEFT JOIN LATERAL (SELECT … WHERE <match> ORDER BY … LIMIT 1)``.

    Rewrite: theta-join ``left ⋈ right ON match`` → rank candidates per left
    key → keep rank 1 → (for ``how='left'``) re-attach left rows that had no
    candidate. ``match`` may be an arbitrary theta predicate (regex match,
    containment, range) — exactly the reference's
    ``desc ~* r.pattern_regex`` candidate join
    (models/classified_card_transactions.sql:139-144).

    ``broadcast_right=True`` is the scale path when the right side is a
    dimension (795 regex patterns in the reference): the big side never
    shuffles for the join.

    ``left_key`` must uniquely identify left rows (the lateral is per-ROW);
    the left-outer variant is the theta join itself run as ``left`` — an
    unmatched row survives as its single null-extended candidate and wins
    its own window trivially, so no re-attach join (and no second shuffle)
    is ever needed.
    """
    r = F.broadcast(right) if broadcast_right else right
    candidates = left.join(r, on=match, how=how)
    return top1_per_group(candidates, [F.col(k) for k in left_key], order_by)
