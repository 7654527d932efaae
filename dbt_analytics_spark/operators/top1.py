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


def _collect_ranked_dim(dim: DataFrame, order_by: Sequence[Column]) -> list:
    """Collect a pattern dimension in rank order (first row = best match).

    The dim is broadcast-sized by contract (the reference's merchant_regex
    seed is 795 rows; models/classified_card_transactions.sql:126-147), so
    a driver collect is the same data movement a broadcast join performs.
    """
    return dim.orderBy(*order_by).collect()


def lateral_top1_case(
    left: DataFrame,
    dim: DataFrame,
    *,
    text_cols: Sequence[str],
    order_by: Sequence[Column],
    pattern_col: str,
    payload_cols: Sequence[str],
    case_insensitive: bool = True,
) -> DataFrame:
    """Regex lateral-top-1 as ONE literal CASE chain — no join, no shuffle.

    Because the lateral's ORDER BY ranks *patterns* (priority/length/key),
    not per-row values, the rank order is a property of the dim alone: sort
    the 795 patterns once, and the first pattern that matches a row IS that
    row's top-1. A CASE WHEN chain in rank order with LITERAL patterns gets
    both wins the theta-join path structurally cannot have:

    - literal ``rlike`` compiles each java.util.regex.Pattern ONCE in
      codegen init (the non-literal pattern column recompiles per evaluated
      pair), and
    - CASE short-circuits — a row stops at its first match instead of
      evaluating all 795 patterns.

    100 TB shape: embarrassingly parallel map over the big side, zero
    exchanges; the dim rides into the plan as literals (same driver-side
    footprint as the broadcast it replaces). Unmatched rows keep NULL
    payloads (left-outer semantics).
    """
    rows = _collect_ranked_dim(dim, order_by)
    prefix = "(?i)" if case_insensitive else ""
    if not rows:
        # Empty pattern dim: honor the left-outer contract — every left row
        # survives with NULL-typed payload columns (typed from the dim's
        # schema so downstream casts/joins see the same types either way).
        types = {f.name: f.dataType for f in dim.schema.fields}
        return left.select(
            "*", *[F.lit(None).cast(types[p]).alias(p) for p in payload_cols]
        )

    def cond(row) -> Column:
        pat = prefix + row[pattern_col]  # plain literal → codegen precompiles
        c = None
        for tc in text_cols:
            m = F.col(tc).rlike(pat)
            c = m if c is None else (c | m)
        return c

    chain = None
    for row in rows:
        payload = F.struct(
            *[F.lit(row[p]).alias(p) for p in payload_cols]
        )
        chain = (
            F.when(cond(row), payload)
            if chain is None
            else chain.when(cond(row), payload)
        )
    best = chain.otherwise(F.lit(None))
    return left.select(
        "*", *[best[p].alias(p) for p in payload_cols]
    )


def lateral_top1_udf(
    left: DataFrame,
    dim: DataFrame,
    *,
    text_cols: Sequence[str],
    order_by: Sequence[Column],
    pattern_col: str,
    payload_cols: Sequence[str],
    case_insensitive: bool = True,
) -> DataFrame:
    """Regex lateral-top-1 via an Arrow-batched pandas UDF matcher.

    Patterns are precompiled ONCE per executor (``re`` module cache in the
    closure) and scanned in rank order with early exit per row. The UDF
    returns only the winning pattern's rank index; payloads attach JVM-side
    via ``element_at`` on literal arrays — no join, no shuffle. Python-side
    cost is the per-row loop; the probe (scripts/probe_j3_matchers.py)
    decides when this beats the JVM CASE chain.

    Regex dialect: this matcher runs Python ``re``, the CASE-chain variant
    runs java.util.regex — patterns come from a user-editable seed, so the
    driver FAILS FAST here on any pattern Python can't compile (Java-only
    constructs: ``\\p{...}`` classes, possessive quantifiers) instead of an
    opaque executor traceback. Residual semantic gap to know about: Java's
    ``(?i)``/``\\b``/``\\w`` are ASCII-default while Python's are Unicode —
    identical for the reference's ASCII merchant patterns
    (tests/test_functions.py audits every seed pattern both ways), but a
    Unicode-dependent pattern should use ``lateral_top1_case`` (pure Java)
    for engine-exact semantics.
    """
    import re as _re_check

    import pandas as pd

    rows = _collect_ranked_dim(dim, order_by)
    if not rows:
        # Empty pattern dim: same left-outer contract as lateral_top1_case —
        # every left row survives with NULL payloads typed from the dim's
        # schema. Without the cast the literal-NULL payloads come out as
        # void/NullType, diverging from the CASE matcher and breaking
        # downstream unionByName/parquet writes against typed columns.
        types = {f.name: f.dataType for f in dim.schema.fields}
        return left.select(
            "*", *[F.lit(None).cast(types[p]).alias(p) for p in payload_cols]
        )
    patterns = [r[pattern_col] for r in rows]
    flags_ci = case_insensitive
    for p in patterns:
        try:
            _re_check.compile(p, _re_check.IGNORECASE if flags_ci else 0)
        except _re_check.error as e:
            raise ValueError(
                f"lateral_top1_udf: pattern {p!r} is not valid Python-re "
                f"syntax ({e}); Java-only constructs are unsupported by the "
                "Arrow matcher — use lateral_top1_case for that pattern set"
            ) from None

    compiled_cache: list = []

    def match_idx(*cols: pd.Series) -> pd.Series:
        import re as _re

        if not compiled_cache:  # once per executor process, not per batch
            flags = _re.IGNORECASE if flags_ci else 0
            compiled_cache.extend(_re.compile(p, flags) for p in patterns)
        compiled = compiled_cache
        out = []
        n = len(cols[0])
        for i in range(n):
            texts = [c.iat[i] for c in cols]
            hit = -1
            for j, cp in enumerate(compiled):
                if any(t is not None and cp.search(t) for t in texts):
                    hit = j
                    break
            out.append(hit)
        return pd.Series(out, dtype="int32")

    # pandas_udf infers the eval type from the signature — a *args function
    # has no per-parameter hints, so synthesize a fixed-arity signature for
    # the actual number of text columns.
    import inspect

    match_idx.__annotations__ = {
        **{f"c{i}": pd.Series for i in range(len(text_cols))},
        "return": pd.Series,
    }
    match_idx.__signature__ = inspect.Signature(
        [
            inspect.Parameter(
                f"c{i}",
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
                annotation=pd.Series,
            )
            for i in range(len(text_cols))
        ],
        return_annotation=pd.Series,
    )
    idx_udf = F.pandas_udf(match_idx, "int")

    with_idx = left.withColumn("__rank_idx", idx_udf(*[F.col(c) for c in text_cols]))
    out = with_idx
    for p in payload_cols:
        arr = F.array(*[F.lit(r[p]) for r in rows])
        out = out.withColumn(
            p,
            F.when(
                F.col("__rank_idx") >= 0,
                F.element_at(arr, F.col("__rank_idx") + 1),
            ),
        )
    return out.drop("__rank_idx")


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    n_salts: int | None = None,
    salt_on: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the best ``k`` rows per group, with a dense 1..k ``rank_col``.

    Scale shape — measured, not assumed: for a ``row_number() <= k``
    filter Catalyst inserts **WindowGroupLimit** in Partial mode BEFORE
    the exchange and Final mode after it (plan-pinned in
    tests/test_plan_quality.py), i.e. every input partition keeps only
    its own top-k per group map-side. That is exactly the two-phase
    hot-stratum rewrite, done by the optimizer: the shuffle carries at
    most ``k x input_partitions`` rows per group and no task ever sorts a
    whole hot stratum. Probed at 5M rows with a 90% hot group
    (BENCH_NOTES round-7 session 2): the plain window (0.62 s warm) BEATS
    the manual salted two-phase (0.87 s) — the salt's second window pass
    is pure overhead on top of what WindowGroupLimit already did.

    ``n_salts`` keeps the manual two-phase available for window functions
    the rank-pushdown does not cover; it is row-identical to the plain
    path (pinned by test) but measured slower for row_number top-k —
    leave it unset there. The salt derives from ``salt_on`` (pass a
    high-cardinality column, e.g. the unique id) and never affects the
    result; callers must make ``order_by`` a total order via a unique
    tiebreak either way.
    """
    if n_salts:
        if not salt_on:
            raise ValueError("topk_per_group: n_salts requires salt_on (a high-cardinality column)")
        salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
        w1 = Window.partitionBy(*partition_by, salt).orderBy(*order_by)
        df = (
            df.withColumn("__salt_rn", F.row_number().over(w1))
            .filter(F.col("__salt_rn") <= k)
            .drop("__salt_rn")
        )
    w2 = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
