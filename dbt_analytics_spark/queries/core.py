"""Core relational operator queries (SURVEY.md §2a inventory) over the
driver testdata star schema, each with a DuckDB oracle.

Cross-engine exactness rules used throughout (so order-insensitive value
hashes match bit-for-bit):

- Money aggregates go through ``DECIMAL(18,2)`` casts *before* summing —
  decimal addition is exact and associative, so Spark's and DuckDB's
  different summation orders produce identical results; the final cast to
  DOUBLE is deterministic. Never sum raw doubles.
- Products keep bounded decimal precision (18,2)×(8,2) → no intermediate
  rounding in either engine.
- Averages are computed as exact-decimal-sum / count (double division of
  identical operands), never the engines' own double AVG.
- No raw timestamps in outputs (dates / ints / strings only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import date_trunc_pg, extract_pg, ts_us
from ..operators import explode_csv_cell, lateral_top1_join, top1_per_group
from ..operators.asof import asof_join
from ..operators.rangejoin import interval_join
from ..sources import load_testdata
from ..sources.readers import DIM_BROADCAST_BUDGET, table_disk_bytes


def _money(c):
    return c.cast("decimal(18,2)")


def _rate(c):
    """Exact small-scale rate (discount/tax, 2-decimal valued)."""
    return c.cast("decimal(8,2)")


# ---------------------------------------------------------------------------
# A1/A2/A3/M1 — hash aggregate, aggregate functions, arithmetic
# (reference: models/spend_monthly.sql:12-27, metrics_monthly.sql:15-21)
# ---------------------------------------------------------------------------

#: floor(x*100 + 0.5) provably recovers exact cents only while the
#: scaled per-row value stays below 2^45 * 100 (docstring proof in
#: q1_pricing_summary); past it, double ulp spacing exceeds the 0.5
#: rounding margin and the recovery can silently mis-round by one
#: hundredth. Machine-checked against the collected per-group max so
#: the "provably exact" claim raises, like the overflow claim, instead
#: of degrading silently.
_CENTS_EXACT_BOUND = (1 << 45) * 100


def _guarded(value, n, mx, mn, what, mnraw=None, check_exactness=True):
    """count*max overflow proof for an exact long money sum (the star
    layout's guarded_cents_spend contract, star_layout.py): a group's sum
    of NON-NEGATIVE longs is <= count * max, so `count*max <= 2^63-1`
    (checked in decimal — that product cannot itself wrap) proves the
    long sum did not overflow; `min >= 0` machine-checks the
    non-negativity precondition; `max <= 2^45*100` machine-checks the
    floor-cast exactness precondition. ``mnraw``, when supplied, is the
    min of the RAW double inputs — it catches negatives in (-0.005, 0)
    whose scaled cents truncate to 0 and would slip past the scaled
    min>=0 check. ``check_exactness=False`` drops the 2^45 bound for
    callers whose cents are decimal-exact BY CONSTRUCTION (the lineitem
    layout's stored columns — no floor-cast recovery happened, so no
    recovery bound applies; the overflow proof still does). Past any
    bound: raise loudly, never return a wrapped or mis-rounded
    number."""
    long_max = (1 << 63) - 1
    guard = F.when(
        mn < 0,
        F.raise_error(
            F.lit(
                f"q1 {what}: negative scaled value observed — the "
                "count*max overflow proof is unsound for signed "
                "values; re-aggregate with decimal accumulation"
            )
        ).cast("double"),
    )
    if mnraw is not None:
        guard = guard.when(
            mnraw < 0,
            F.raise_error(
                F.lit(
                    f"q1 {what}: negative raw money value observed — "
                    "cast-to-long truncates toward zero, so inputs in "
                    "(-0.005, 0) scale to 0 cents and evade the scaled "
                    "min>=0 check; re-aggregate with decimal accumulation"
                )
            ).cast("double"),
        )
    if check_exactness:
        guard = guard.when(
            mx > F.lit(_CENTS_EXACT_BOUND),
            F.raise_error(
                F.lit(
                    f"q1 {what}: scaled value exceeds 2^45*100 — "
                    "floor(x*100+0.5) cents recovery is no longer "
                    "provably exact at this magnitude; re-aggregate "
                    "with decimal accumulation"
                )
            ).cast("double"),
        )
    return (
        guard.when(
            n.cast("decimal(38,0)") * mx
            > F.lit(long_max).cast("decimal(38,0)"),
            F.raise_error(
                F.lit(
                    f"q1 {what}: long sum may have overflowed (count*max "
                    "exceeds 2^63); re-aggregate with decimal accumulation"
                )
            ).cast("double"),
        )
        .otherwise(value)
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped rollup: groupBy agg with sums/avgs/conditional math.

    Scale: pure map-side-combinable aggregation on a low-cardinality key —
    one shuffle of tiny partial aggregates; AQE coalesces post-shuffle.

    Money math runs in EXACT integer cents/long space, not decimal: the
    r13 stage decomposition (scripts/probe_q1_decomp.py, 60M rows,
    min-of-5 interleaved, load+drift gated) measured the 128-bit decimal
    SUM accumulation as the dominant term — ONE decimal(18,2) sum cost
    1.4s over the 0.5s scan floor, the original 4-decimal-sum plan 3.6s,
    Round(double)'s per-row BigDecimal.setScale another 2x, while this
    all-long floor-cast plan runs 0.64s (2.1x of DuckDB's whole query)
    for identical output. Exactness: for a double that is the nearest
    representation of a 2-decimal value v, |x*100 - 100v| <=
    100*ulp(v)/2 + ulp(100v)/2 << 0.5 for |v| < 2^45, so
    floor(x*100 + 0.5) provably recovers the true integer cents /
    hundredths (0 mismatches vs the decimal cast at sf0.001/0.01);
    products are then exact longs at scale 4 (disc_price) and scale 6
    (charge), long sums re-round HALF_UP in integer space on the 6-row
    output frame, and the long->double conversion goes through
    decimal(38,0)/100 which is the same correctly-rounded value the
    decimal plan produced. Overflow: each sum carries the layout's
    count*max proof columns (measured +2%) and raises loudly past 2^63
    instead of wrapping — at that scale the remedy is decimal
    accumulation or a salted two-level rollup.
    """
    from ..plans.star_layout import (
        maybe_lineitem_layout,
        maybe_q1_rollup,
    )

    # Layout awareness (round 14), best route first. (1) The q1 GRAIN
    # ROLLUP: the whole aggregation precomputed as 6 rows of re-foldable
    # partials — the ad-hoc twin of the semantic layer's aggregate
    # awareness, and the end state the r13 verdict named ("cover
    # lineitem/q1's grain"): the routed q1 is a 6-row read + overflow
    # proofs. (2) The cents-enriched lineitem LAYOUT: stored exact
    # integer money columns, no per-row cents recovery (the measured
    # residual, BENCH_Q1_DECOMP_r13: ad-hoc 2.89x -> layout 2.41x at
    # 60M; the rollup closes the rest). Both fingerprint-guarded with
    # silent fallback, like j1's star routing; q1b shares this query's
    # oracle so every routed path stays hash-checked. NEVER builds.
    rollup = maybe_q1_rollup(spark, sf_dir)
    if rollup is not None:
        return _q1_from_rollup(spark.table(rollup))
    tbl = maybe_lineitem_layout(spark, sf_dir)
    if tbl is not None:
        return _q1_from_stored_cents(spark.table(tbl))

    li = load_testdata(spark, sf_dir)["lineitem"]
    # floor(x + 0.5) == round-half-up for non-negative x, and the long
    # cast is a plain conversion — Spark's Round(double) goes through
    # BigDecimal.setScale PER ROW, measured as nearly half the remaining
    # query cost (probe: 1.28 s round vs 0.64 s floor-cast at 60M). A
    # negative input would floor the wrong way, but 2-decimal negatives
    # produce cents <= -1 and the guard's min>=0 check below raises
    # before any value leaves the query.
    cents = (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_h = ((F.lit(1) - F.col("l_discount")) * 100 + F.lit(0.5)).cast(
        "long"
    )
    tax_h = ((F.lit(1) + F.col("l_tax")) * 100 + F.lit(0.5)).cast("long")
    disc_i4 = cents * disc_h  # exact integer at scale 4
    charge_i6 = disc_i4 * tax_h  # exact integer at scale 6
    # raw-double min: catches negatives in (-0.005, 0) whose scaled
    # cents truncate to 0 and evade the scaled check
    mnraw_in = F.least(
        F.col("l_extendedprice"),
        F.lit(1.0) - F.col("l_discount"),
        F.lit(1.0) + F.col("l_tax"),
    )
    return _q1_aggregate(
        li, cents, disc_i4, charge_i6, mnraw_in=mnraw_in,
        check_exactness=True,
    )


def _q1_from_stored_cents(li: DataFrame) -> DataFrame:
    """q1 over the lineitem layout's stored exact-cents columns
    (plans/star_layout._derive_lineitem): the cents are decimal-exact by
    construction, so neither the floor-cast exactness bound nor the
    raw-double negative check applies — the count*max overflow proof and
    the min>=0 non-negativity proof still run on every sum."""
    return _q1_aggregate(
        li,
        F.col("l_cents"),
        F.col("l_disc_i4"),
        F.col("l_charge_i6"),
        mnraw_in=None,
        check_exactness=False,
    )


def _q1_aggregate(
    li: DataFrame,
    cents,
    disc_i4,
    charge_i6,
    mnraw_in=None,
    check_exactness=True,
) -> DataFrame:
    def dollars(col):  # exact long -> double via decimal, like the layout
        return (col.cast("decimal(38,0)") / F.lit(100)).cast("double")

    n = F.col("count_order")
    # ONE collapsed proof pair instead of per-column min/max (measured
    # 0.78 -> 0.69 s at 60M): min(least(...)) >= 0 proves every summed
    # column non-negative; count * max(greatest(...)) bounds every sum
    # conservatively.
    mx, mn = F.col("__mx"), F.col("__mn")
    aggs = [
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(cents).alias("__s2"),
        F.sum(disc_i4).alias("__s4"),
        F.sum(charge_i6).alias("__s6"),
        F.count(F.lit(1)).alias("count_order"),
        F.max(F.greatest(cents, disc_i4, charge_i6)).alias("__mx"),
        F.min(F.least(cents, disc_i4, charge_i6)).alias("__mn"),
    ]
    mnraw = None
    if mnraw_in is not None:
        aggs.append(F.min(mnraw_in).alias("__mnraw"))
        mnraw = F.col("__mnraw")

    def g(value, what):
        return _guarded(
            value, n, mx, mn, what, mnraw, check_exactness=check_exactness
        )

    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(*aggs)
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            g(dollars(F.col("__s2")), "sum_base_price").alias(
                "sum_base_price"
            ),
            # HALF_UP to cents in integer space: (x + half) div scale
            g(dollars(F.expr("(__s4 + 50) div 100")), "sum_disc_price")
            .alias("sum_disc_price"),
            g(dollars(F.expr("(__s6 + 5000) div 10000")), "sum_charge")
            .alias("sum_charge"),
            (F.col("sum_qty") / n).alias("avg_qty"),
            g(dollars(F.col("__s2")) / n, "avg_price").alias("avg_price"),
            "count_order",
        )
    )


def _q1_from_rollup(partials: DataFrame) -> DataFrame:
    """q1's final select over the stored 6-row grain rollup
    (plans/star_layout._q1_rollup_frame): the same integer HALF_UP
    rounding, exact long->double conversion, and count*max overflow
    proof as every other q1 path — applied to folded partials. The
    proof stays sound on folds: count and max fold exactly, and
    count*max <= 2^63 bounds the true sum, so a stored sum that had
    wrapped is impossible whenever the check passes."""
    n, mx, mn = F.col("n"), F.col("mx"), F.col("mn")

    def dollars(col):
        return (col.cast("decimal(38,0)") / F.lit(100)).cast("double")

    def g(value, what):
        return _guarded(value, n, mx, mn, what, check_exactness=False)

    return partials.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        g(dollars(F.col("s2")), "sum_base_price").alias("sum_base_price"),
        g(dollars(F.expr("(s4 + 50) div 100")), "sum_disc_price").alias(
            "sum_disc_price"
        ),
        g(dollars(F.expr("(s6 + 5000) div 10000")), "sum_charge").alias(
            "sum_charge"
        ),
        (F.col("sum_qty") / n).alias("avg_qty"),
        g(dollars(F.col("s2")) / n, "avg_price").alias("avg_price"),
        F.col("n").alias("count_order"),
    )


def q1b_pricing_summary_layout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q1 on the ENGINE-OWNED cents-enriched lineitem layout
    (plans/star_layout.ensure_lineitem_layout) — the scan-floor analogue
    of j1b: same answer as q1_pricing_summary (same DuckDB oracle),
    different physical contract. The layout stores l_cents / l_disc_i4 /
    l_charge_i6 computed ONCE via exact decimal casts, so the rollup is
    seven pure long aggregations over a zstd scan — no per-row cents
    recovery, no Round(double), no decimal accumulation (the three terms
    the r13 decomposition measured above the scan floor). The raw q1 row
    stays benched beside this one: this prices the layout-amortized
    steady state, that one the cold ad-hoc shape (which routes — to the
    6-row grain rollup when fresh, else here — when the layout family
    already exists). The ensure also builds the grain rollup, so one
    warmup pass provisions every q1 route."""
    from ..plans.star_layout import (
        ensure_lineitem_layout,
        ensure_q1_rollup,
    )

    tbl = ensure_lineitem_layout(spark, sf_dir)
    ensure_q1_rollup(spark, sf_dir)
    return _q1_from_stored_cents(spark.table(tbl))


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# P1/P4 — projection, aliasing, casts
# (reference: models/card_transactions_model.sql:1-18; metrics_monthly.sql:5-7)
# ---------------------------------------------------------------------------

def p1_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").cast("int").alias("cust_key"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"),
        F.upper(F.col("o_orderstatus")).alias("status"),
    )


P1_SQL = """
SELECT o_orderkey AS order_key,
       CAST(o_custkey AS INTEGER) AS cust_key,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       UPPER(o_orderstatus) AS status
FROM orders
"""


# ---------------------------------------------------------------------------
# P2/T1 — filter with ILIKE / IN / boolean combos
# (reference: models/classified_card_transactions.sql:14-28; T1 ilike corpus
#  models/card_merchants_model.sql:7-617)
# ---------------------------------------------------------------------------

def p2_filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_testdata(spark, sf_dir)["part"]
    return (
        p.filter(
            F.col("p_type").ilike("%EcOn%")
            & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size") != 0)
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


P2_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_type ILIKE '%EcOn%'
  AND p_brand IN ('Brand#1','Brand#2','Brand#3')
  AND p_size != 0
"""


# ---------------------------------------------------------------------------
# P3 — nested CASE classification (reference: the 500+-arm classifier,
# models/card_merchants_model.sql:2-617; sign-branching
# classified_card_transactions.sql:320-355)
# ---------------------------------------------------------------------------

def p3_case_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    bucket = (
        F.when(F.col("event_type") == "purchase", F.lit("revenue"))
        .when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .when((F.col("event_type") == "error") & (F.col("value") > 100), F.lit("critical_error"))
        .when(F.col("event_type") == "error", F.lit("minor_error"))
        .otherwise(F.lit("other"))
    )
    sign = F.when(F.col("value") < 50, F.lit("low")).when(F.col("value") < 150, F.lit("mid")).otherwise(F.lit("high"))
    return (
        ev.select(bucket.alias("bucket"), sign.alias("value_band"))
        .groupBy("bucket", "value_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )


P3_SQL = """
SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
            WHEN event_type IN ('click','view') THEN 'engagement'
            WHEN event_type = 'error' AND value > 100 THEN 'critical_error'
            WHEN event_type = 'error' THEN 'minor_error'
            ELSE 'other' END AS bucket,
       CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS value_band,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# P5 — COALESCE / NULL handling
# (reference: classified_card_transactions.sql:252-261 resolver precedence)
# ---------------------------------------------------------------------------

def p5_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    resolved = F.coalesce(
        F.when(F.col("event_type") == "purchase", k),
        F.when(F.col("value") > 150, F.lit(-1)),
        F.lit(0),
    )
    return (
        ev.select(F.col("event_type"), resolved.alias("resolved_k"))
        .groupBy("event_type")
        .agg(
            F.sum("resolved_k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


P5_SQL = """
SELECT event_type,
       CAST(SUM(COALESCE(CASE WHEN event_type = 'purchase' THEN CAST(json_extract_string(props, '$.k') AS INTEGER) END,
                    CASE WHEN value > 150 THEN -1 END,
                    0)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# J1 — equi inner join (+ multi-hop) with aggregation
# (reference: models/metrics_monthly.sql:57-59)
# Scale: region/nation are broadcast (no shuffle of the fact side for those
# hops); the orders⋈customer shuffle keys on the high-cardinality custkey.
# ---------------------------------------------------------------------------

def j1_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.star_layout import (
        maybe_nation_rollup,
        maybe_star_layout,
        nation_names,
    )

    # Aggregate awareness (round 15): j1's whole 15M-row fact join is
    # precomputed as 25 re-foldable nation-grain partials
    # (star_layout.ensure_nation_rollup — the star-join twin of q1's
    # grain rollup). When the rollup verifiably derives from the CURRENT
    # orders+customer files, j1 is a 25-row read + live name attach; the
    # final expressions are IDENTICAL to j1b's (same oracle, hash-checked
    # every round). Fallback ladder: rollup → bucketed layout → raw.
    rollup = maybe_nation_rollup(spark, sf_dir)
    if rollup is not None:
        return _j1_from_rollup(spark, sf_dir, spark.table(rollup))
    # Layout awareness (round 13): when the engine already owns the
    # bucketed star layout for this data — and the layout verifiably
    # derives from the CURRENT source files (sidecar fingerprint) — the
    # ad-hoc query inherits its exchange-free plan instead of paying the
    # per-query broadcast/shuffle. Same silent-fallback contract as
    # rollup routing; j1b shares this query's oracle, so routing never
    # weakens the correctness gate. NEVER builds the layout.
    if maybe_star_layout(spark, sf_dir) is not None:
        return j1b_join_agg_bucketed(spark, sf_dir)

    t = load_testdata(spark, sf_dir)
    # Int-key discipline on the AD-HOC path too (r12 stage decomposition,
    # BENCH_J1B_STAGES_r12: carrying n_name/r_name strings through the
    # fact-join probe cost 4.4x the keys-only join): the fact only ever
    # meets the pruned (c_custkey, c_nationkey) int map — a smaller
    # broadcast than the old flattened-string dim — aggregates on the int
    # key, and the 25-row post-agg frame broadcast-joins the names.
    cust_nk = t["customer"].select("c_custkey", "c_nationkey")
    names = nation_names(spark, sf_dir)
    if table_disk_bytes(sf_dir, "customer") <= DIM_BROADCAST_BUDGET:
        # Star-schema fast path: broadcast the int map, probe the fact
        # once, and partial-aggregate straight to the 25-nation output
        # grain — no wide shuffle anywhere (measured sf10: 1.85 s
        # reduce-first vs 1.21 s this plan). The gate is the dim's TRUE
        # on-disk size, not Catalyst's projection estimate, which at sf10
        # let the 15M-row fact ride broadcast.
        per_key = (
            t["orders"]
            .join(
                F.broadcast(cust_nk),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(_money(F.col("o_totalprice")))
                .cast("double")
                .alias("total_spend"),
            )
        )
    else:
        # Dim too big to broadcast (cluster-scale customer): collapse the
        # fact to one row per custkey first so the shuffle join carries
        # ~10x fewer rows and neither fact side is ever a broadcast
        # build. count / decimal-sum regrouping is exact.
        per_cust = t["orders"].groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("cust_orders"),
            F.sum(_money(F.col("o_totalprice"))).alias("cust_spend"),
        )
        per_key = (
            per_cust
            .join(cust_nk, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(
                F.sum("cust_orders").alias("n_orders"),
                F.sum("cust_spend").cast("double").alias("total_spend"),
            )
        )
    return per_key.join(
        F.broadcast(names), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
        "n_orders",
        "total_spend",
    )


def _j1_from_rollup(
    spark: SparkSession, sf_dir: str, partials: DataFrame
) -> DataFrame:
    """j1's final select over the stored 25-row nation rollup — the
    exact j1b tail (guarded cents spend + broadcast name attach), so the
    routed result is bit-identical to the layout and raw paths."""
    from ..plans.star_layout import guarded_cents_spend, nation_names

    return (
        partials.join(
            F.broadcast(nation_names(spark, sf_dir)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "n_orders",
            guarded_cents_spend(
                F.col("n_orders"),
                F.col("cents"),
                F.col("mx"),
                F.col("mn"),
            ).alias("total_spend"),
        )
    )


J1_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def j1b_join_agg_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 on the ENGINE-OWNED bucketed star layout (plans/star_layout.py).

    Same answer as j1_join_agg (same DuckDB oracle), different physical
    contract: both join sides are bucketed+sorted on the customer key, so
    the fact⋈dim join runs with ZERO exchanges and no per-query broadcast
    build — the measured residual that kept the ad-hoc j1 at ~10x DuckDB
    at sf10. The shuffle_hash hint pins a bucket-local hash join (each
    task builds from its own co-bucketed dim bucket — measured 0.62 s vs
    0.73 s bucketed SMJ at sf10); Catalyst cannot re-introduce a
    broadcast build. The aggregation sums the layout's exact-cents long
    column (see star_layout: sum(o_cents)/100 == the decimal-cast sum
    bit-for-bit, minus the per-row decimal cast and 128-bit accumulation
    the measured scan floor was paying).

    Int-key probe (layout v4): the r12 stage decomposition
    (BENCH_J1B_STAGES_r12) split the remaining 2.5x-at-960M residual into
    stage terms — keys-only bucket join 2.0 s at 240M rows, the SAME join
    carrying the n_name/r_name strings 8.9 s. The per-row cost was never
    the join; it was copying dictionary-decoded name strings through the
    probe and hashing them in the groupBy, 240M times, for a 25-row
    output. So the query joins only the pruned ``(c_custkey,
    n_nationkey)`` columns (narrow int build side, cache-resident),
    aggregates on the int key, and broadcast-joins the names onto the
    25-row result — strings never touch the fact path. Measured at sf160:
    4.58 s string-carry vs 3.43 s int-key (2.33x -> 1.74x vs DuckDB).
    The raw-parquet j1 row stays benched beside this one: this row prices
    the layout-amortized steady state, that one the cold ad-hoc shape.
    """
    from ..plans.star_layout import (
        ensure_star_layout,
        guarded_cents_spend,
        nation_names,
    )

    orders_tbl, custmap_tbl = ensure_star_layout(spark, sf_dir)
    o = spark.table(orders_tbl).select("o_custkey", "o_cents")
    c = (
        spark.table(custmap_tbl)
        .select("c_custkey", "n_nationkey")
        .hint("shuffle_hash")
    )
    per_key = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_cents").alias("__cents"),
            F.max("o_cents").alias("__mx"),
            F.min("o_cents").alias("__mn"),
        )
    )
    return (
        per_key.join(
            F.broadcast(nation_names(spark, sf_dir)), "n_nationkey"
        )
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "n_orders",
            # Long-sum hot path, overflow-guarded by the count*max proof
            # (see star_layout.guarded_cents_spend: +3% measured at sf10
            # vs +18% for decimal accumulation; the min column machine-
            # checks the proof's non-negativity precondition).
            guarded_cents_spend(
                F.col("n_orders"),
                F.col("__cents"),
                F.col("__mx"),
                F.col("__mn"),
            ).alias("total_spend"),
        )
    )


def w3b_pct_of_total_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 on the engine-owned bucketed star layout — see j1b. The
    percent-of-total window runs over the 25-row nation aggregate, so the
    only nontrivial physical work is the exchange-free bucketed join —
    which, like j1b, probes on the pruned int key and attaches names
    post-agg (layout v4: name strings through the 960M-row probe were the
    measured residual, BENCH_J1B_STAGES_r12). Cents arithmetic: nation
    and total spends are exact integer cent sums; /100 through decimal
    reproduces the oracle's decimal values bit-for-bit before the final
    double casts."""
    from ..plans.star_layout import (
        ensure_star_layout,
        guarded_cents_spend,
        nation_names,
    )

    orders_tbl, custmap_tbl = ensure_star_layout(spark, sf_dir)
    o = spark.table(orders_tbl).select("o_custkey", "o_cents")
    c = (
        spark.table(custmap_tbl)
        .select("c_custkey", "n_nationkey")
        .hint("shuffle_hash")
    )
    per_nation = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_nationkey")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("o_cents").alias("spend_cents"),
            F.max("o_cents").alias("__mx"),
            F.min("o_cents").alias("__mn"),
        )
        .join(
            F.broadcast(
                nation_names(spark, sf_dir).select("n_nationkey", "n_name")
            ),
            "n_nationkey",
        )
        .withColumnRenamed("n_name", "nation_name")
    )
    w = Window.partitionBy()
    # Per-nation: long-sum hot path, overflow-guarded (count*max proof —
    # star_layout.guarded_cents_spend; min machine-checks non-negativity).
    # Grand total: decimal accumulation over the 25-row nation aggregate
    # (a sum of per-group long sums has no count*max bound; at 25 rows
    # the decimal cost is nil).
    spend = guarded_cents_spend(
        F.col("__n"), F.col("spend_cents"), F.col("__mx"), F.col("__mn")
    )
    total = (
        F.sum(F.col("spend_cents").cast("decimal(38,0)")).over(w)
        / F.lit(100)
    ).cast("double")
    return per_nation.select(
        "nation_name",
        spend.alias("nation_spend"),
        (spend / total).alias("pct_of_total"),
    )


# ---------------------------------------------------------------------------
# J2 — left outer join with null-filling
# (reference: models/metrics_monthly.sql:120-130 spine joins;
#  classified_card_transactions.sql:200-201 enrichment joins)
# ---------------------------------------------------------------------------

def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    per_cust = t["orders"].groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_money(F.col("o_totalprice"))).cast("double").alias("spend"),
    )
    return (
        t["customer"]
        .join(per_cust, t["customer"].c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_mktsegment").alias("segment"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("total_spend"),
        )
    )


J2_SQL = """
SELECT c_custkey AS cust_key, c_mktsegment AS segment,
       COALESCE(o.cnt, 0) AS n_orders,
       COALESCE(o.spend, 0.0) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o.o_custkey
"""


# ---------------------------------------------------------------------------
# J3/SO2 — LATERAL ... ORDER BY ... LIMIT 1 rewrite (top-1 per left row)
# (reference: classified_card_transactions.sql:126-147,157-184 — the
#  regex/name best-match laterals; rewritten as candidates + ranking window)
# ---------------------------------------------------------------------------

def j3_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    best = top1_per_group(
        o,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
    )
    return best.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("best_order_key"),
        _money(F.col("o_totalprice")).cast("double").alias("best_total_price"),
    )


J3_SQL = """
SELECT o_custkey AS cust_key, o_orderkey AS best_order_key,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS best_total_price
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# J3 (regex form) — LEFT JOIN LATERAL … ORDER BY priority/pattern-length
# LIMIT 1, the reference's hardest operator: a regex theta-join picking the
# best-matching pattern per row
# (reference: classified_card_transactions.sql:126-147 — `desc ~* r.pattern_regex`
#  ordered by priority desc, length(pattern_regex) desc, limit 1)
# ---------------------------------------------------------------------------

#: (pattern, priority, tag) — Java- and PCRE-compatible patterns only
#: (the same dialect audit applied to the reference's 795 seed patterns).
_REGEX_DIM = [
    (r"(?i)\bdata\b", 3, "data"),
    (r"(?i)\b(spark|query)\b", 2, "engine"),
    (r"(?i)model", 2, "model"),
    (r"(?i)\bthe\b", 1, "stopword"),
]


def j3b_regex_lateral_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir)["documents"].select("doc_id", "text")
    dim = spark.createDataFrame(_REGEX_DIM, "pattern string, priority int, tag string")
    best = lateral_top1_join(
        docs,
        dim,
        match=F.regexp_like(F.col("text"), F.col("pattern")),
        order_by=[F.desc("priority"), F.desc(F.length("pattern")), F.asc("tag")],
        left_key=["doc_id"],
        how="left",
    )
    return best.select(
        "doc_id",
        F.coalesce(F.col("tag"), F.lit("none")).alias("best_tag"),
        F.coalesce(F.col("priority"), F.lit(0)).cast("int").alias("best_priority"),
    )


# DuckDB standard string literals keep backslashes verbatim — no escaping.
_REGEX_DIM_SQL = ", ".join(
    f"('{p}', {prio}, '{tag}')" for p, prio, tag in _REGEX_DIM
)

J3B_SQL = f"""
WITH pat(pattern, priority, tag) AS (
  VALUES {_REGEX_DIM_SQL}
), cand AS (
  SELECT d.doc_id, p.tag, p.priority,
         ROW_NUMBER() OVER (
           PARTITION BY d.doc_id
           ORDER BY p.priority DESC, length(p.pattern) DESC, p.tag ASC
         ) AS rn
  FROM documents d JOIN pat p ON regexp_matches(d.text, p.pattern)
)
SELECT d.doc_id,
       COALESCE(c.tag, 'none') AS best_tag,
       CAST(COALESCE(c.priority, 0) AS INTEGER) AS best_priority
FROM documents d LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# J5/T5 — lateral UNNEST flatten (split + explode)
# (reference: models/exercise_log_flattened.sql:6-7)
# ---------------------------------------------------------------------------

def j5_explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word frequency + document frequency over exploded text.

    Shape (round 15, BENCH_J5_DECOMP): the naive
    ``count(*) + count(distinct doc_id)`` plans an Expand + a distinct
    aggregate keyed on (lang, word, doc_id) — cardinality ~ docs x
    words-per-doc, so the map-side combine can't compress and the
    shuffle carries the whole exploded corpus (4.5 s at 500k docs,
    2.25x DuckDB). Instead, dedup WITHIN each document first —
    ``array_distinct`` on the split array is local O(words) work, no
    shuffle — then both legs are plain counts partial-aggregated on
    (lang, word): vocabulary-bounded shuffles regardless of corpus
    size (3.3 s, 1.66x; the two legs join on their shared grouping
    keys, so no third exchange at scale). Relies on doc_id being the
    documents PK (one row per doc), which load_testdata guarantees:
    count-rows-over-per-doc-distinct-words == count(distinct doc_id).
    The two legs join null-safely on lang: a NULL-lang document forms
    its own group under groupBy (and under the oracle's GROUP BY), so a
    null-rejecting equi-join would silently drop it.
    """
    docs = load_testdata(spark, sf_dir)["documents"]
    # Round 17: the VERDICT-suggested single-aggregation fold (ONE
    # explode of the per-doc SORTED word array with a first-occurrence
    # flag — plan loses one scan leg, one aggregation and the join) was
    # implemented and MEASURED, then rejected on the numbers: at sf10
    # (500k docs) it reads 7.2-8.6 s count/exec vs 3.2-3.4 s for this
    # two-leg shape, and at sf0.1 0.43 vs 0.33 s — the array_sort /
    # transform / filter chain is CodegenFallback (interpreted per
    # element), which costs ~2.5x more than the second codegen'd
    # split+explode pass it saves; a struct-flag variant that avoids
    # carrying the array through the Generate measures the same
    # (7.2-8.6 s), so the HOF interpretation itself is the cost. Same
    # conclusion as the r15 minhash fold-vs-agg probe: keep the codegen
    # path, measure before believing a plan-shape win.
    words = explode_csv_cell(
        docs.select("doc_id", "lang", "text"), "text", "word", sep=" "
    )
    occ = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    doc_words = F.array_remove(
        F.array_distinct(
            F.transform(F.split(F.col("text"), " "), lambda w: F.trim(w))
        ),
        "",
    )
    doc_freq = (
        docs.select("lang", F.explode(doc_words).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    o, d = occ.alias("o"), doc_freq.alias("d")
    return o.join(
        d,
        F.col("o.lang").eqNullSafe(F.col("d.lang"))
        & (F.col("o.word") == F.col("d.word")),
    ).select(
        F.col("o.lang").alias("lang"),
        F.col("o.word").alias("word"),
        "n",
        "n_docs",
    )


J5_SQL = """
SELECT lang, TRIM(w.word) AS word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
FROM documents, UNNEST(string_split(text, ' ')) AS w(word)
WHERE TRIM(w.word) != ''
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A4 — count(distinct expr) (reference: models/workouts_monthly.sql:3)
# ---------------------------------------------------------------------------

def a4_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_testdata(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


A4_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A3 — conditional aggregation (FILTER / CASE-in-agg)
# (reference: models/metrics_monthly.sql:16-21,54-55)
# ---------------------------------------------------------------------------

def a3_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_testdata(spark, sf_dir)["lineitem"]
    return (
        li.groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
            F.sum(F.when(F.col("l_discount") > 0.05, _money(F.col("l_extendedprice")))).cast("double").alias("discounted_rev"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


A3_SQL = """
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS discounted_rev,
       COUNT(*) AS n_total
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# W1 — ranking window dedup (keep latest row per key)
# (reference: classified_card_transactions.sql:211-217 map_one)
# ---------------------------------------------------------------------------

def w1_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    latest = top1_per_group(ev, ["user_id"], [F.desc("ts"), F.desc("event_id")])
    return latest.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.col("event_type").alias("latest_event_type"),
    )


W1_SQL = """
SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# W2 — analytic window: first-occurrence New/Repeat flag
# (reference: models/metrics_monthly.sql:45-47 first_value dish flag)
# ---------------------------------------------------------------------------

def w2_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey")
    flagged = o.withColumn(
        "order_flag",
        F.when(F.col("o_orderdate") == F.min("o_orderdate").over(w), F.lit("New")).otherwise(F.lit("Repeat")),
    )
    return (
        flagged.groupBy(date_trunc_pg("month", "o_orderdate").alias("order_month"), "order_flag")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


W2_SQL = """
WITH flagged AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
         CASE WHEN o_orderdate = MIN(o_orderdate) OVER (PARTITION BY o_custkey)
              THEN 'New' ELSE 'Repeat' END AS order_flag
  FROM orders
)
SELECT order_month, order_flag, COUNT(*) AS n_orders
FROM flagged GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# W3 — empty-frame window: percent-of-total alongside GROUP BY
# (reference: models/card_merchants_model.sql:622-623 sum(sum(x)) over ())
# ---------------------------------------------------------------------------

def w3_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.star_layout import maybe_nation_rollup, maybe_star_layout

    # Aggregate awareness (round 15) — see j1_join_agg: the 25-row
    # nation rollup carries exactly w3's partials; the tail below is
    # w3b's (same oracle). Ladder: rollup → bucketed layout → raw.
    rollup = maybe_nation_rollup(spark, sf_dir)
    if rollup is not None:
        return _w3_from_rollup(spark, sf_dir, spark.table(rollup))
    # Layout awareness — see j1_join_agg: route to the engine-owned
    # bucketed layout when it exists and is verifiably fresh; w3b shares
    # this query's oracle. Silent fallback, never builds.
    if maybe_star_layout(spark, sf_dir) is not None:
        return w3b_pct_of_total_bucketed(spark, sf_dir)

    t = load_testdata(spark, sf_dir)
    # Size-gated star join (same strategy + measurements as j1): when the
    # customer dim's TRUE on-disk footprint fits the broadcast budget,
    # broadcast the (custkey → nation) map and partial-aggregate the fact
    # straight to the 25-nation grain — one fact pass, no wide shuffle.
    # Past the budget (cluster-scale customer), reduce-before-join: sum
    # orders per custkey FIRST (map-side partials, ~10x row reduction),
    # then shuffle-join the dim. Decimal addition is associative, so
    # regrouping the sum is bit-exact under the oracle either way. The
    # explicit gate exists because Catalyst's compressed-size estimate let
    # the 15M-row orders side through the broadcast threshold at sf10 (a
    # fact-table broadcast build — 7.9 s vs 1.6 s, and at cluster scale a
    # driver OOM). Facts never ride broadcast; dims only within budget.
    # Int-key discipline (BENCH_J1B_STAGES_r12, same as j1): the fact only
    # meets the pruned (c_custkey, c_nationkey) int map; the n_name string
    # attaches to the 25-row post-agg frame, never rides the probe.
    cust_nk = t["customer"].select("c_custkey", "c_nationkey")
    if table_disk_bytes(sf_dir, "customer") <= DIM_BROADCAST_BUDGET:
        per_key = (
            t["orders"]
            .join(F.broadcast(cust_nk), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.sum(_money(F.col("o_totalprice"))).alias("spend_dec"))
        )
    else:
        per_cust = t["orders"].groupBy("o_custkey").agg(
            F.sum(_money(F.col("o_totalprice"))).alias("cust_spend")
        )
        per_key = (
            per_cust
            .join(cust_nk, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.sum("cust_spend").alias("spend_dec"))
        )
    per_nation = per_key.join(
        F.broadcast(
            t["nation"].select("n_nationkey", F.col("n_name").alias("nation_name"))
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy()
    return per_nation.select(
        "nation_name",
        F.col("spend_dec").cast("double").alias("nation_spend"),
        (F.col("spend_dec").cast("double") / F.sum("spend_dec").over(w).cast("double")).alias("pct_of_total"),
    )


def _w3_from_rollup(
    spark: SparkSession, sf_dir: str, partials: DataFrame
) -> DataFrame:
    """w3's final select over the stored 25-row nation rollup — the
    exact w3b tail: guarded cents spend per nation, decimal-accumulated
    grand total over the 25 partial rows (bit-identical to summing the
    per-group decimal sums, which is what the oracle does)."""
    from ..plans.star_layout import guarded_cents_spend, nation_names

    per_nation = partials.join(
        F.broadcast(
            nation_names(spark, sf_dir).select("n_nationkey", "n_name")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).withColumnRenamed("n_name", "nation_name")
    w = Window.partitionBy()
    spend = guarded_cents_spend(
        F.col("n_orders"), F.col("cents"), F.col("mx"), F.col("mn")
    )
    total = (
        F.sum(F.col("cents").cast("decimal(38,0)")).over(w) / F.lit(100)
    ).cast("double")
    return per_nation.select(
        "nation_name",
        spend.alias("nation_spend"),
        (spend / total).alias("pct_of_total"),
    )


W3_SQL = """
WITH per_nation AS (
  SELECT n_name AS nation_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  GROUP BY n_name
)
SELECT nation_name, CAST(spend_dec AS DOUBLE) AS nation_spend,
       CAST(spend_dec AS DOUBLE) / CAST(SUM(spend_dec) OVER () AS DOUBLE) AS pct_of_total
FROM per_nation
"""


# ---------------------------------------------------------------------------
# U1 — UNION (distinct) across branches
# (reference: classified_card_transactions.sql:267,320 — the dedup trap)
# ---------------------------------------------------------------------------

def u1_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    # PG `union` is UNION DISTINCT — duplicates across AND within branches
    # collapse, so the two same-table branches fold into ONE scan with the
    # disjunction pushed to the parquet reader (r16, guide §2.4): the set
    # `distinct(σ_A(o) ⊎ σ_B(o))` equals `distinct(σ_{A∨B}(o))` — a row
    # in either branch satisfies A∨B and vice versa (SQL three-valued OR:
    # true∨null = true, so rows where one predicate is null and the other
    # true are kept by both forms). Plan: 2 scans + Union + Exchange →
    # 1 scan + Exchange (plans/r16/u1_union_dedup_{before,after}.txt);
    # the oracle keeps the literal UNION formulation.
    return (
        o.filter(
            (F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 100000)
        )
        .select("o_custkey", F.col("o_orderpriority").alias("priority"))
        .dropDuplicates()
    )


U1_SQL = """
SELECT o_custkey, o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey, o_orderpriority AS priority FROM orders WHERE o_totalprice > 100000
"""


# ---------------------------------------------------------------------------
# U2 — UNION ALL inline dimension (reference: models/card_names_model.sql:1-6)
# ---------------------------------------------------------------------------

def u2_union_all_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    rows = [
        ("1-URGENT", "expedite"),
        ("2-HIGH", "expedite"),
        ("3-MEDIUM", "normal"),
        ("4-NOT SPECIFIED", "normal"),
        ("5-LOW", "defer"),
    ]
    dim = spark.createDataFrame(rows, ["priority", "sla_class"])
    return (
        o.join(F.broadcast(dim), o.o_orderpriority == dim.priority)
        .groupBy("sla_class")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


U2_SQL = """
WITH dim AS (
  SELECT '1-URGENT' AS priority, 'expedite' AS sla_class
  UNION ALL SELECT '2-HIGH', 'expedite'
  UNION ALL SELECT '3-MEDIUM', 'normal'
  UNION ALL SELECT '4-NOT SPECIFIED', 'normal'
  UNION ALL SELECT '5-LOW', 'defer'
)
SELECT sla_class, COUNT(*) AS n_orders
FROM orders JOIN dim ON o_orderpriority = dim.priority
GROUP BY sla_class
"""


# ---------------------------------------------------------------------------
# G1/D3/J2 — date spine (dense calendar × sparse facts), interval arithmetic
# (reference: models/metrics_monthly.sql:3-10,118-131 generate_series spine)
# Bounds derive from the data (not wall clock) so runs are deterministic —
# the workload engine's injectable-clock equivalent (SURVEY.md §5).
# ---------------------------------------------------------------------------

def g1_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.star_layout import (
        ROUTE_MIN_FACT_BYTES,
        guarded_cents_spend,
        maybe_monthly_rollup,
    )

    # Aggregate awareness (round 16): the whole 15M-row monthly
    # aggregate precomputed as ~80 re-foldable partials
    # (star_layout.ensure_monthly_rollup — the single-source twin of
    # q1's grain rollup, provisioned by the same star-family warmup).
    # When the rollup verifiably derives from the CURRENT orders files,
    # g1 is an ~80-row read + gap-fill; silent fallback, fact-size
    # gated, NEVER builds — so the driver's small-SF correctness gate
    # always exercises the raw arithmetic below.
    rollup = maybe_monthly_rollup(spark, sf_dir)
    if rollup is not None:
        monthly = spark.table(rollup).select(
            "month_start",
            "cnt",
            guarded_cents_spend(
                F.col("cnt"), F.col("cents"), F.col("mx"), F.col("mn")
            ).alias("spend"),
        )
    elif table_disk_bytes(sf_dir, "orders") < ROUTE_MIN_FACT_BYTES:
        # Round 17 (VERDICT r16 item 1): below the same fact-size gate
        # that turns the rollup route off, the r16 gap-fill's fixed cost
        # (global window + sequence/explode) LOSES to the r15 two-scan
        # shape on the count series — measured interleaved at sf0.1:
        # two-scan 0.152 s vs gap-fill 0.204 s min-of-5 (the driver saw
        # the same 0.161 -> 0.206 regression). A second scan of a
        # <32 MB fact is noise; the spine join broadcasts a ~80-row
        # relation. Above the gate the single-scan gap-fill stands (at
        # sf10 it took g1 exec 1.34 -> 0.19 s — the r16 win), and the
        # rollup route covers the provisioned-warehouse case anyway.
        # Integer-cents sum kept identical to the branches below (the
        # bit-exactness argument is scale-independent).
        o = load_testdata(spark, sf_dir)["orders"]
        bounds = o.agg(
            F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
            F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
        )
        spine = bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 month"))
            ).alias("month_start")
        )
        cents = (_money(F.col("o_totalprice")) * 100).cast("long")
        monthly = o.groupBy(
            date_trunc_pg("month", "o_orderdate").alias("month_start")
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(cents).cast("decimal(38,0)") / F.lit(100))
            .cast("double")
            .alias("spend"),
        )
        return spine.join(monthly, "month_start", "left").select(
            "month_start",
            F.last_day("month_start").alias("month_end"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("total_spend"),
        )
    else:
        o = load_testdata(spark, sf_dir)["orders"]
        # Exact integer-cents sum (r16, guide §2.3 narrower types):
        # _money is a 2-decimal value, so (decimal(18,2) * 100)::long is
        # EXACT cents, long sums are exact, and the decimal(38,0)/100
        # division is the same correctly-rounded double as
        # sum(decimal)::double — the o_cents/l_cents layout argument
        # (star_layout.py:171), applied in-query. Measured at sf10: the
        # monthly aggregate drops 1.19 -> 0.79 s (decimal-sum machinery
        # is the cost, not date_trunc); equality verified bit-exact on
        # every month at sf10 and by the oracle gate. The division goes
        # through decimal(38,0) like q1's dollars()/the rollup path, so
        # raw and routed spend are the same expression over the same
        # exact long.
        cents = (_money(F.col("o_totalprice")) * 100).cast("long")
        monthly = o.groupBy(
            date_trunc_pg("month", "o_orderdate").alias("month_start")
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(cents).cast("decimal(38,0)") / F.lit(100))
            .cast("double")
            .alias("spend"),
        )
    # Gap-fill the spine from the ~80-row monthly aggregate itself, not a
    # second bounds scan of the fact (r16, guide §2.4: remove shuffles/
    # passes outright). The spine's lo/hi are trunc(month, min/max(date))
    # — date_trunc is monotone, so both bounds are themselves PRESENT
    # months (rows of `monthly`), and every spine month lies between one
    # present month and the next: each monthly row emits itself plus the
    # absent months up to its successor (lead over the tiny aggregate),
    # zero-filled. Same rows as spine-LEFT JOIN-monthly, with ONE fact
    # scan instead of two and no join (plan: 2 orders scans + join → 1
    # scan, pinned in plans/r16/g1_date_spine_after.txt). Edge behavior
    # unchanged: empty input → 0 monthly rows → 0 out; a NULL order date
    # forms a NULL month group that the old version's min/max ignored and
    # its spine join dropped — here sequence(NULL, ..) explodes to zero
    # rows for that group, dropping it identically.
    # Round 17 (guide §2.4): the global lead() window requires AllTuples;
    # without help the planner satisfies it with an Exchange
    # SinglePartition AFTER the monthly aggregate — a whole extra shuffle
    # stage (plus its scheduling round) to move ~80 rows. coalesce(1)
    # reports SinglePartition, so the window's distribution requirement is
    # met with NO exchange: the final aggregate folds into one task that
    # reads the map-side partials directly. Scale argument: months are
    # calendar-bounded (a century of data is ~1200 groups), so the
    # single-task final fold reads (map_tasks x months) pre-combined
    # partial rows — the same shape Spark itself plans for any GLOBAL
    # aggregate, and strictly less data than the removed exchange's input.
    # Driver-bench effect at sf0.1: the r16 gap-fill's ~45 ms fixed-cost
    # regression (VERDICT r16 item 1) comes back under the r15 number.
    w = Window.orderBy("month_start")
    return (
        monthly.coalesce(1).withColumn("nxt", F.lead("month_start").over(w))
        .select(
            F.col("month_start").alias("own_month"),
            "cnt",
            "spend",
            F.explode(
                F.sequence(
                    "month_start",
                    F.coalesce(F.add_months("nxt", -1), F.col("month_start")),
                    F.expr("interval 1 month"),
                )
            ).alias("month_start"),
        )
        .select(
            "month_start",
            F.last_day("month_start").alias("month_end"),
            F.when(F.col("month_start") == F.col("own_month"), F.col("cnt"))
            .otherwise(F.lit(0))
            .alias("n_orders"),
            F.when(F.col("month_start") == F.col("own_month"), F.col("spend"))
            .otherwise(F.lit(0.0))
            .alias("total_spend"),
        )
    )


G1_SQL = """
WITH b AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders
), spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month_start FROM b
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY 1
)
SELECT spine.month_start,
       CAST(spine.month_start + INTERVAL 1 MONTH - INTERVAL 1 DAY AS DATE) AS month_end,
       COALESCE(monthly.cnt, 0) AS n_orders,
       COALESCE(monthly.spend, 0.0) AS total_spend
FROM spine LEFT JOIN monthly USING (month_start)
"""


# ---------------------------------------------------------------------------
# D1/D2 — date_trunc grains + extract
# (reference: models/spend_daily.sql:2, metrics_weekly.sql:7 — PG week is
#  ISO-Monday; Spark's date_trunc('week') and weekofyear match)
# ---------------------------------------------------------------------------

def d1_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    return (
        o.groupBy(
            date_trunc_pg("week", "o_orderdate").alias("week_start"),
            F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


D1_SQL = """
SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS iso_week,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# Q3-shape — 3-way join (customer ⋈ orders ⋈ lineitem) + filtered agg +
# top-N: the classic shipping-priority plan. Scale: customer broadcast
# (dim), orders⋈lineitem co-shuffled on orderkey, TakeOrdered for the limit.
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    cutoff = "1995-03-15"
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit(cutoff).cast("date"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit(cutoff).cast("date"))
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").alias("order_key"),
            "revenue",
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
    )


Q3_SQL = """
SELECT l_orderkey AS order_key,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       o_orderdate AS order_date, o_orderpriority AS order_priority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q5-shape — 6-way join through region→nation→customer/supplier with a
# co-nationality theta condition. Scale: the dim chain
# (region⋈nation⋈supplier) broadcasts; the fact side shuffles once on
# orderkey.
# ---------------------------------------------------------------------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# A1 (grain family) — the workload's spend_{daily..yearly} pattern: one
# rollup per time grain, stacked with a grain label
# (reference: models/spend_monthly.sql:16-27 × 5 grain variants)
# ---------------------------------------------------------------------------

def a1_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    parts = []
    for grain in ("month", "quarter", "year"):
        parts.append(
            o.groupBy(
                F.lit(grain).alias("grain"),
                date_trunc_pg(grain, "o_orderdate").alias("period_start"),
            ).agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(_money(F.col("o_totalprice"))).cast("double").alias("total_price"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


A1_SQL = """
SELECT 'month' AS grain, CAST(date_trunc('month', o_orderdate) AS DATE) AS period_start,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY 2
UNION ALL
SELECT 'quarter', CAST(date_trunc('quarter', o_orderdate) AS DATE),
       COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders GROUP BY 2
UNION ALL
SELECT 'year', CAST(date_trunc('year', o_orderdate) AS DATE),
       COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders GROUP BY 2
"""


# ---------------------------------------------------------------------------
# W4 — running-total and lag windows (frame-bounded analytic functions)
# ---------------------------------------------------------------------------

def w4_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"].filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = (
        F.sum(_money(F.col("o_totalprice")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    gap = F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
    return o.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        running.alias("running_spend"),
        gap.cast("int").alias("days_since_prev"),
    )


W4_SQL = """
SELECT o_custkey AS cust_key, o_orderkey AS order_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(date_diff('day',
         LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         o_orderdate) AS INTEGER) AS days_since_prev
FROM orders WHERE o_custkey % 10 = 0
"""


# ---------------------------------------------------------------------------
# D2 — extract() fields with PG semantics: ISO week, dow Sunday=0, doy
# (reference: models/metrics_monthly.sql:7, metrics_weekly.sql:7)
# ---------------------------------------------------------------------------

def d2_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        extract_pg("month", "o_orderdate").alias("order_month"),
        extract_pg("week", "o_orderdate").alias("iso_week"),
        extract_pg("quarter", "o_orderdate").alias("order_quarter"),
        extract_pg("year", "o_orderdate").alias("order_year"),
        extract_pg("dow", "o_orderdate").alias("dow_sun0"),
        extract_pg("doy", "o_orderdate").alias("doy"),
    )


D2_SQL = """
SELECT o_orderkey AS order_key,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
       CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS iso_week,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(DOW FROM o_orderdate) AS INTEGER) AS dow_sun0,
       CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS doy
FROM orders
"""


# ---------------------------------------------------------------------------
# J4 — CROSS JOIN LATERAL computing correlated scalar expansions.
# The reference derives per-merchant name variants inline
# (models/classified_card_transactions.sql:160-171); Spark's mapping is
# plain column expressions — no join operator exists in the plan at all.
# The oracle keeps the LATERAL form to prove the rewrite is equivalent.
# ---------------------------------------------------------------------------

def j4_lateral_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_testdata(spark, sf_dir)["part"]
    lname = F.lower(F.col("p_name"))
    first_tok = F.element_at(F.split(lname, " "), 1)
    return p.select(
        F.col("p_partkey").alias("part_key"),
        lname.alias("lname"),
        first_tok.alias("first_token"),
        F.length(lname).cast("int").alias("name_len"),
        (F.length(lname) - F.length(F.replace(lname, F.lit(" "), F.lit("")))).cast(
            "int"
        ).alias("n_spaces"),
    ).filter(F.length(first_tok) >= 4)


J4_SQL = """
SELECT p_partkey AS part_key, l.lname, l.first_token, l.name_len, l.n_spaces
FROM part, LATERAL (
  SELECT lower(p_name) AS lname,
         split_part(lower(p_name), ' ', 1) AS first_token,
         CAST(length(lower(p_name)) AS INTEGER) AS name_len,
         CAST(length(lower(p_name)) - length(replace(lower(p_name), ' ', '')) AS INTEGER) AS n_spaces
) l
WHERE length(l.first_token) >= 4
"""


# ---------------------------------------------------------------------------
# D3/D4 — interval arithmetic (`+ interval '1 month - 1 day'`, `+ 6 days`,
# add_months) and month-boundary helpers
# (reference: metrics_monthly.sql:5-7, metrics_weekly.sql:6)
# ---------------------------------------------------------------------------

def d3_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        # PG's `date_trunc('month', d) + interval '1 month - 1 day'`
        F.expr(
            "date_trunc('month', o_orderdate) + interval 1 month - interval 1 day"
        ).cast("date").alias("month_end"),
        F.date_add("o_orderdate", 6).alias("week_end"),
        F.add_months("o_orderdate", 3).alias("plus_3mo"),
        F.last_day("o_orderdate").alias("eom"),
    )


D3_SQL = """
SELECT o_orderkey AS order_key,
       CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY AS DATE) AS month_end,
       CAST(o_orderdate + INTERVAL 6 DAY AS DATE) AS week_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
       last_day(o_orderdate) AS eom
FROM orders
"""


# ---------------------------------------------------------------------------
# T2 — case-insensitive regex match (PG `~*`)
# (reference: classified_card_transactions.sql:85-87,139-144)
# ---------------------------------------------------------------------------

def t2_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir)["documents"]
    pat = r"(?i)^the\s+\w+"
    return (
        docs.select(
            "doc_id",
            F.col("text").rlike(pat).alias("starts_with_the"),
            F.col("text").rlike(r"(?i)(spark|vector)\s+(join|window)").alias("has_spark_join"),
        )
        .groupBy("starts_with_the", "has_spark_join")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


T2_SQL = """
SELECT regexp_matches(text, '(?i)^the\\s+\\w+') AS starts_with_the,
       regexp_matches(text, '(?i)(spark|vector)\\s+(join|window)') AS has_spark_join,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# T3/T4 — regexp_replace normalization pipeline + string scalars
# (reference: classified_card_transactions.sql:38-108 normalization chain)
# ---------------------------------------------------------------------------

def t3_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir)["documents"]
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    stripped = F.regexp_replace(norm, r"(?i)^(the|a)\s+", "")
    return docs.select(
        "doc_id",
        F.substring(stripped, 1, 30).alias("norm_prefix"),
        F.length(stripped).alias("norm_len"),
        F.locate("spark", stripped).alias("spark_pos"),
    )


T3_SQL = """
WITH n AS (
  SELECT doc_id,
         regexp_replace(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), '(?i)^(the|a)\\s+', '') AS s
  FROM documents
)
SELECT doc_id, SUBSTRING(s, 1, 30) AS norm_prefix, LENGTH(s) AS norm_len,
       POSITION('spark' IN s) AS spark_pos
FROM n
"""


# ---------------------------------------------------------------------------
# T4 — string scalar functions: left/right/length/position/replace/trim
# (reference: classified_card_transactions.sql:38-46,171,174-177,265,273)
# ---------------------------------------------------------------------------

def t4_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_testdata(spark, sf_dir)["part"]
    return p.select(
        F.col("p_partkey").alias("part_key"),
        F.substring("p_name", 1, 5).alias("left5"),
        # PG `right(s, length(s)-6)` (empty when the name is shorter)
        F.expr("right(p_name, greatest(length(p_name) - 6, 0))").alias("right_tail"),
        F.length("p_name").cast("int").alias("name_len"),
        F.locate("green", F.col("p_name")).cast("int").alias("green_pos"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.trim(F.upper(F.col("p_name"))).alias("upper_name"),
    )


T4_SQL = """
SELECT p_partkey AS part_key,
       left(p_name, 5) AS left5,
       right(p_name, greatest(length(p_name) - 6, 0)) AS right_tail,
       CAST(length(p_name) AS INTEGER) AS name_len,
       CAST(POSITION('green' IN p_name) AS INTEGER) AS green_pos,
       replace(p_name, ' ', '_') AS snake_name,
       TRIM(UPPER(p_name)) AS upper_name
FROM part
"""


# ---------------------------------------------------------------------------
# SO1 — multi-key ORDER BY + LIMIT (top-N)
# (reference: classified_card_transactions.sql:363-364 final sorts; LIMIT is
#  deterministic here because the sort key is total: tiebreak on o_orderkey)
# Scale note: Spark executes orderBy+limit as TakeOrderedAndProject — no
# global sort materialization.
# ---------------------------------------------------------------------------

def so1_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("order_key"),
            _money(F.col("o_totalprice")).cast("double").alias("total_price"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


SO1_SQL = """
SELECT o_orderkey AS order_key,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       o_orderpriority AS priority
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# ---------------------------------------------------------------------------
# EV1 — gap-based sessionization (lag window + running flag sum)
# (extension beyond reference surface; SURVEY.md §2b "not present" list —
#  implemented because an events/stream table is first-class here)
# Skew: the user_id window serializes a hot user through one task (AQE
# never splits windows). operators/sessionize.py sessionize(bucket=...)
# is the two-phase, row-identical mitigation — measured in skew_probe.py /
# BENCH_NOTES.md "Round-6 skew probe"; ev1b below runs it under oracle.
# ---------------------------------------------------------------------------

def ev1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap test (timestamp minus timestamp → interval),
    # matching the oracle's `ts - LAG(ts) > INTERVAL 30 MINUTE`.
    prev = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(
            prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_new_session").alias("n_sessions"),
        )
    )


EV1_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
)
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(is_new_session) AS BIGINT) AS n_sessions
FROM flagged GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# EV1B — per-SESSION stats via the two-phase (time-bucketed) sessionizer.
# Spark runs the skew-proof composite-key plan (operators/sessionize.py,
# windows on (user, 6h-bucket) + per-bucket stitch); the DuckDB oracle is
# the plain single-window formulation — a hash-green row is cross-engine
# proof that the two-phase rewrite is row-identical, per-event session ids
# included.
# ---------------------------------------------------------------------------

def ev1b_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize

    ev = load_testdata(spark, sf_dir)["events"]
    s = sessionize(
        ev, gap="30 minutes", order_cols=["event_id"], bucket="6 hours"
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_us(F.min("ts")).alias("start_us"),
        ts_us(F.max("ts")).alias("end_us"),
    )


EV1B_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
FROM sess GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# EV2 — semi-structured JSON extraction from a string column
# (extension; Spark get_json_object stays JVM-side)
# ---------------------------------------------------------------------------

def ev2_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") % 2 == 0, 1)).alias("n_even"),
        )
    )


EV2_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0 THEN 1 END) AS n_even
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# EV3 — as-of join (extension): each click joins the latest prior purchase
# of the same user. Spark composition: union + running-last window (one
# shuffle on user_id) — see operators/asof.py. DuckDB's native ASOF JOIN is
# the oracle. For hot user_ids use asof_join(time_bucket=...) — the
# two-phase skew-proof plan (BENCH_NOTES.md "Round-6 skew probe").
# ---------------------------------------------------------------------------

def ev3_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(
            F.max_by("value", "event_id").alias("purchase_value"),
            F.max("event_id").alias("purchase_event_id"),
        )
        .withColumn("purchase_ts_us", ts_us("p_ts"))
        .drop("p_ts")
        .withColumn("ts", F.timestamp_micros(F.col("purchase_ts_us")))
    )
    joined = asof_join(
        clicks,
        purchases,
        time_col="ts",
        by=["user_id"],
        value_cols=["purchase_value", "purchase_event_id", "purchase_ts_us"],
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("purchase_event_id").cast("bigint").alias("purchase_id"),
        "purchase_value",
        (ts_us("ts") - F.col("purchase_ts_us")).cast("bigint").alias("gap_us"),
    )


EV3_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts,
         arg_max(value, event_id) AS purchase_value,
         max(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.event_id AS click_id, c.user_id,
       CAST(p.purchase_event_id AS BIGINT) AS purchase_id,
       p.purchase_value,
       CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


# ---------------------------------------------------------------------------
# EV3B — as-of join, FORWARD direction with a tolerance bound: each click
# joins the EARLIEST subsequent purchase of the same user, but only if it
# lands within 2 days (attribution-window semantics). Exercises the
# direction="forward" + tolerance arms of operators/asof.py under the
# DuckDB oracle (ASOF LEFT JOIN on c.ts <= p.ts; the tolerance is a
# row-local post-filter that nulls the match, keeping left rows — identical
# on both engines).
# ---------------------------------------------------------------------------

def ev3b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(
            F.max_by("value", "event_id").alias("purchase_value"),
            F.max("event_id").alias("purchase_event_id"),
        )
        .withColumn("purchase_ts_us", ts_us("p_ts"))
        .drop("p_ts")
        .withColumn("ts", F.timestamp_micros(F.col("purchase_ts_us")))
    )
    joined = asof_join(
        clicks,
        purchases,
        time_col="ts",
        by=["user_id"],
        value_cols=["purchase_value", "purchase_event_id", "purchase_ts_us"],
        direction="forward",
        tolerance="2 days",
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("purchase_event_id").cast("bigint").alias("purchase_id"),
        "purchase_value",
        (F.col("purchase_ts_us") - ts_us("ts")).cast("bigint").alias("gap_us"),
    )


EV3B_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts,
         arg_max(value, event_id) AS purchase_value,
         max(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.event_id AS click_id, c.user_id,
       CASE WHEN p.ts - c.ts <= INTERVAL 2 DAY
            THEN CAST(p.purchase_event_id AS BIGINT) END AS purchase_id,
       CASE WHEN p.ts - c.ts <= INTERVAL 2 DAY
            THEN p.purchase_value END AS purchase_value,
       CASE WHEN p.ts - c.ts <= INTERVAL 2 DAY
            THEN CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) END AS gap_us
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


# ---------------------------------------------------------------------------
# EV4 — range (interval-containment) join (extension): events banded by a
# non-uniform value-range dim via bin bucketing — see operators/rangejoin.py.
# Catalyst would run the raw `lo <= v < hi` join as a nested loop; the bin
# rewrite makes it a broadcast hash join on bin id.
# ---------------------------------------------------------------------------

def ev4_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"].select("event_id", "value")
    bands = spark.createDataFrame(
        [
            ("tiny", 0.0, 10.0),
            ("small", 10.0, 25.0),
            ("mid", 25.0, 50.0),
            ("large", 50.0, 100.0),
            ("huge", 100.0, 200.0),
            ("extreme", 200.0, 1000.0),
        ],
        "band string, lo double, hi double",
    )
    j = interval_join(
        ev, bands, "value", "lo", "hi", bin_width=25.0, how="left",
        broadcast_intervals=True,
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_money(F.col("value"))).cast("double").alias("sum_value"),
    )


EV4_SQL = """
SELECT b.band, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e LEFT JOIN (
  VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 25.0), ('mid', 25.0, 50.0),
         ('large', 50.0, 100.0), ('huge', 100.0, 200.0), ('extreme', 200.0, 1000.0)
) AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
"""


# ---------------------------------------------------------------------------
# EV5 — ordered event funnel (extension): view → click → purchase, each
# step's first occurrence constrained to be at-or-after the previous
# step's. Three per-user min-aggregations chained by co-partitioned
# user_id joins — at scale each stage is one shuffle on the same key, so
# AQE reuses the partitioning; no window-sort over whole user histories.
# ---------------------------------------------------------------------------

def ev5_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("view_ts").cast("bigint").alias("users_viewed"),
            F.count("click_ts").cast("bigint").alias("users_clicked"),
            F.count("purchase_ts").cast("bigint").alias("users_purchased"),
            (
                F.count("click_ts").cast("double")
                / F.count("view_ts").cast("double")
            ).alias("click_through"),
            (
                F.count("purchase_ts").cast("double")
                / F.count("click_ts").cast("double")
            ).alias("purchase_through"),
        )
    )


EV5_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts GROUP BY 1
)
SELECT CAST(COUNT(v.view_ts) AS BIGINT) AS users_viewed,
       CAST(COUNT(c.click_ts) AS BIGINT) AS users_clicked,
       CAST(COUNT(p.purchase_ts) AS BIGINT) AS users_purchased,
       CAST(COUNT(c.click_ts) AS DOUBLE) / CAST(COUNT(v.view_ts) AS DOUBLE) AS click_through,
       CAST(COUNT(p.purchase_ts) AS DOUBLE) / CAST(COUNT(c.click_ts) AS DOUBLE) AS purchase_through
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


# ---------------------------------------------------------------------------
# EV5B — the generalized k-step funnel operator (operators/funnel.py) on the
# same view→click→purchase steps, long format. Chained per-user min-aggs,
# no user-keyed window anywhere (skew-immune; BENCH_NOTES "Round-6 skew
# probe" measured the family flat across hot-key shares).
# ---------------------------------------------------------------------------

def ev5b_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel

    ev = load_testdata(spark, sf_dir)["events"]
    return funnel(ev, ["view", "click", "purchase"])


EV5B_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts GROUP BY 1
), s AS (
  SELECT 0 AS step_idx, 'view' AS step, CAST(COUNT(*) AS BIGINT) AS users FROM v
  UNION ALL
  SELECT 1, 'click', CAST(COUNT(*) AS BIGINT) FROM c
  UNION ALL
  SELECT 2, 'purchase', CAST(COUNT(*) AS BIGINT) FROM p
)
SELECT step_idx, step, users,
       CASE WHEN LAG(users) OVER (ORDER BY step_idx) > 0
            THEN CAST(users AS DOUBLE)
                 / CAST(LAG(users) OVER (ORDER BY step_idx) AS DOUBLE)
       END AS conversion
FROM s
"""


# ---------------------------------------------------------------------------
# A2b — ROLLUP grouping sets (beyond-reference; Spark df.rollup vs DuckDB
# GROUP BY ROLLUP)
# ---------------------------------------------------------------------------

def a2_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_money(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n",
            "total_price",
        )
    )


A2_SQL = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# A5 — CUBE grouping sets (beyond-reference; Spark df.cube vs DuckDB
# GROUP BY CUBE): the all-marginals corpus report over (lang, source) —
# every combination plus both one-way margins plus the grand total in one
# aggregation pass. Completes the grouping-set family beside a1
# (explicit multi-grain) and a2 (ROLLUP). avg length is an int/int
# division — exact cross-engine.
# ---------------------------------------------------------------------------

def a5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir)["documents"]
    return (
        docs.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum("n_chars").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_chars"),
        )
        .select("lang", "source", "n_docs", "avg_chars")
    )


A5_SQL = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
FROM documents GROUP BY CUBE (lang, source)
"""


# ---------------------------------------------------------------------------
# A6 — explicit GROUPING SETS (the non-uniform grain list CUBE/ROLLUP
# can't express: (lang, source), (lang), (source) but NOT the grand
# total). Spark 4's native DataFrame.groupingSets — one pass, Expand +
# partial aggregation, no self-union of scans.
# ---------------------------------------------------------------------------

def a6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir)["documents"]
    return (
        docs.groupingSets(
            [["lang", "source"], ["lang"], ["source"]], "lang", "source"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select("lang", "source", "n_docs", "total_chars")
    )


A6_SQL = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), (source))
"""


# ---------------------------------------------------------------------------
# W6 — RANGE-frame window: per event, activity in the PRECEDING HOUR of
# the same user (RANGE BETWEEN on event-time micros — a value-based
# frame, unlike w4's ROWS frame). Count + max keep the comparison exact
# (no float summation inside the frame). The rate-limiting /
# burst-detection primitive for the events family.
# ---------------------------------------------------------------------------

def w6_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_prev_hour"),
        F.max("value").over(w).alias("max_value_prev_hour"),
    )


W6_SQL = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_prev_hour,
       MAX(value) OVER w AS max_value_prev_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# W7 — distribution analytics: percent_rank / cume_dist / nth_value in
# one window pass (the remaining analytic-function family beside W1/W2's
# ranking, W4/W6's frames, W5's ntile). Ratios are (rank-1)/(n-1) and
# rank/n int-derived divisions — exact cross-engine; the ordering key
# includes the unique custkey so every function sees a total order.
# ---------------------------------------------------------------------------

def w7_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_testdata(spark, sf_dir)["customer"]
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w_frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_nationkey").alias("nation_key"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank_r"),
        F.round(F.cume_dist().over(w), 9).alias("cume_dist_r"),
        _money(F.nth_value("c_acctbal", 2).over(w_frame)).cast("double").alias(
            "second_highest_bal"
        ),
    )


W7_SQL = """
SELECT c_custkey AS cust_key, c_nationkey AS nation_key,
       round(percent_rank() OVER w, 9) AS pct_rank_r,
       round(cume_dist() OVER w, 9) AS cume_dist_r,
       CAST(CAST(nth_value(c_acctbal, 2) OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS DECIMAL(18,2)) AS DOUBLE) AS second_highest_bal
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


# ---------------------------------------------------------------------------
# P6 — PIVOT: long→wide event-count matrix per user bucket (df.pivot with
# an EXPLICIT value list — the open-ended form needs a values scan; the
# pinned list keeps it one pass). Spark compiles pivot to conditional
# aggregation, so the oracle is the equivalent FILTERed counts; empty
# cells are coalesced to 0 on the Spark side to match COUNT's 0.
# ---------------------------------------------------------------------------

_P6_TYPES = ["click", "error", "purchase", "signup", "view"]


def p6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    wide = (
        ev.groupBy((F.col("user_id") % 50).alias("bucket"))
        .pivot("event_type", _P6_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "bucket",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in _P6_TYPES],
    )


P6_SQL = """
SELECT user_id % 50 AS bucket,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# U3 — EXCEPT / INTERSECT set operations (distinct semantics, matching the
# SQL defaults): customers ordering in 1995 but not 1996, and in both —
# the remaining set-operator family beside UNION (u1/u2). Both engines
# hash-aggregate the set ops; one pass each side.
# NOTE: generated orders span 1995-01-01 → 2001-08-01, so both windows are
# populated at every scale factor (the round-6 1994-vs-1995 window was
# vacuously empty — VERDICT r6).
# ---------------------------------------------------------------------------

def u3_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir)["orders"]
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    ex = y95.subtract(y96)  # EXCEPT (distinct)
    it = y95.intersect(y96)  # INTERSECT (distinct)
    return ex.select(
        F.lit("except").alias("op"), F.col("o_custkey").alias("custkey")
    ).unionByName(
        it.select(F.lit("intersect").alias("op"), F.col("o_custkey").alias("custkey"))
    )


U3_SQL = """
SELECT 'except' AS op, o_custkey AS custkey FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
)
UNION ALL
SELECT 'intersect' AS op, o_custkey AS custkey FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
)
"""


def u4_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-family, BAG semantics: EXCEPT ALL / INTERSECT ALL keep
    per-row multiplicities (a customer with 3 orders one year and 1 the
    next keeps 2 rows in the difference, 1 in the intersection) —
    Spark's exceptAll/intersectAll, the multiplicity-correct complement
    of u3's distinct set ops. Scale: both compile to one hash
    aggregation counting multiplicities per side then a replicate —
    partial-agg friendly, no row-vs-row join."""
    o = load_testdata(spark, sf_dir)["orders"]
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    ex = y95.exceptAll(y96)
    it = y95.intersectAll(y96)
    return (
        ex.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), F.col("o_custkey").alias("custkey"), "n")
        .unionByName(
            it.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("intersect_all").alias("op"), F.col("o_custkey").alias("custkey"), "n")
        )
    )


U4_SQL = """
SELECT 'except_all' AS op, o_custkey AS custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
) GROUP BY o_custkey
UNION ALL
SELECT 'intersect_all' AS op, o_custkey AS custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
) GROUP BY o_custkey
"""


def w8_lag_lead_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family: LAG/LEAD with IGNORE NULLS + defaults — each event's
    previous/next non-NULL purchase value in its user's stream (gaps from
    non-purchase events must be skipped, not returned as NULL). One
    window over (user, time); WindowExec evaluates ignoreNulls natively
    JVM-side."""
    ev = load_testdata(spark, sf_dir)["events"]
    purchase_val = F.when(
        F.col("event_type") == "purchase", F.col("value")
    )
    # IGNORE NULLS on lag/lead is SQL-syntax-only (the Python lag() helper
    # has no ignoreNulls param) — selectExpr keeps it JVM-side regardless.
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return (
        ev.withColumn("pval", purchase_val)
        .selectExpr(
            "event_id",
            "user_id",
            f"COALESCE(lag(pval) IGNORE NULLS {over}, -1.0D) AS prev_purchase",
            f"COALESCE(lead(pval) IGNORE NULLS {over}, -1.0D) AS next_purchase",
        )
        .filter(F.col("event_id") % 50 == 0)
    )


W8_SQL = """
SELECT event_id, user_id, prev_purchase, next_purchase FROM (
  SELECT
    event_id, user_id,
    COALESCE(LAG(pval IGNORE NULLS) OVER w, -1.0) AS prev_purchase,
    COALESCE(LEAD(pval IGNORE NULLS) OVER w, -1.0) AS next_purchase
  FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN event_type = 'purchase' THEN value END AS pval
    FROM events
  )
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE event_id % 50 = 0
"""


# ---------------------------------------------------------------------------
# F1 — exact discrete percentiles (beyond-reference; percentile_disc picks
# an actual element, so cross-engine float equality is exact)
# ---------------------------------------------------------------------------

def f1_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


F1_SQL = """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# F4 — one-pass table profiling (plans/profiling.py): per-column null /
# distinct / min / max / width stats for catalog + data-quality surfaces.
# Exact variant under oracle; approx=True (HLL++ partials) is the cluster
# default. Deliberately integer/string-only outputs — no float drift.
# ---------------------------------------------------------------------------

def f4_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.profiling import profile_table

    docs = load_testdata(spark, sf_dir)["documents"]
    return profile_table(
        docs, columns=["doc_id", "source", "lang"], approx=False
    )


def _f4_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS column,
       COUNT(*) AS n_rows,
       CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(MIN({col}) AS VARCHAR) AS min_v,
       CAST(MAX({col}) AS VARCHAR) AS max_v,
       CAST(SUM(length(CAST({col} AS VARCHAR))) AS BIGINT) AS sum_len
FROM documents"""


F4_SQL = " UNION ALL ".join(_f4_col_sql(c) for c in ["doc_id", "source", "lang"])


# ---------------------------------------------------------------------------
# Q4-shape — EXISTS → left-semi join: orders with at least one deeply
# discounted lineitem (testdata lineitem has no commit/receipt dates).
# Scale: the semi join shuffles on orderkey once; no dedup pass is ever
# needed because semi joins can't duplicate the left side.
# ---------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    late = t["lineitem"].filter(F.col("l_discount") > 0.05)
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority AS order_priority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_discount > 0.05
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q22-shape — NOT EXISTS → left-anti join: positive-balance customers with
# no recent orders (none on/after 2000-01-01), rolled up by nation.
# ---------------------------------------------------------------------------

def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    rich = t["customer"].filter(F.col("c_acctbal") > 0)
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(_money(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
    )


Q22_SQL = """
SELECT c_nationkey AS nation_key, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q6-shape — pure scan-side filter + single global aggregate: the plan
# every storage layer must get right (all three predicates pushed to the
# parquet scan, zero joins, one partial→final agg — the 100 TB cost is
# exactly one pruned column scan).
# ---------------------------------------------------------------------------

def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_testdata(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(
            F.sum(_money(F.col("l_extendedprice")) * _rate(F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q10-shape — returned-item revenue per customer, top 20: fact⋈fact on
# orderkey (the one shuffle), dims broadcast, deterministic tiebreak on
# the LIMIT so cross-engine ordering is exact.
# ---------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    # Int-key discipline (BENCH_J1B_STAGES_r12): c_name/n_name are
    # functionally dependent on c_custkey, so the agg groups on the key
    # alone — strings never ride the fact probe or the aggregate — and
    # the name columns attach AFTER the top-20 cut, to 20 rows.
    top = (
        returned.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("cust_key"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("cust_key"))
        .limit(20)
    )
    names = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    # the 20-row frame is the broadcast side; customer scans once,
    # semi-filtered by the broadcast keys — never the other way around
    return (
        names.join(F.broadcast(top), F.col("cust_key") == F.col("c_custkey"))
        .select(
            "cust_key",
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("cust_key"))
    )


Q10_SQL = """
SELECT c_custkey AS cust_key, c_name AS cust_name, n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY 1, 2, 3
ORDER BY revenue DESC, cust_key ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q14-shape — promo revenue share: conditional aggregate over a
# fact⋈broadcast-dim join; the ratio is double-division of two exact
# decimal sums so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("date"))
    )
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    joined = li.join(
        F.broadcast(t["part"].select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    sums = joined.groupBy().agg(
        F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("promo_dec"),
        F.sum(revenue).alias("total_dec"),
    )
    return sums.select(
        (F.lit(100.0) * F.col("promo_dec").cast("double") / F.col("total_dec").cast("double")).alias("promo_pct"),
        F.col("promo_dec").cast("double").alias("promo_revenue"),
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS promo_pct,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'
"""


# ---------------------------------------------------------------------------
# Q7-shape — bilateral volume shipping: the two-dim-sides join (supplier
# nation × customer nation) with an IN-pair filter and a year rollup.
# Both nation-tagged key maps broadcast; the fact⋈fact orderkey join is
# the only wide shuffle.
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    n1, n2 = "NATION_3", "NATION_2"
    # Selective dims FIRST: the nation filter keeps 2 of 25 nations, so
    # joining each fact against its pre-FILTERED broadcast dim cuts both
    # facts to ~8% BEFORE the fact⋈fact orderkey shuffle — the join-order
    # rewrite Catalyst can't do statically (it can't see the filter's
    # selectivity through the dim join). Measured at sf10: 8.4 s with the
    # facts joined full-size first, ~2.1 s this way.
    # Int-key discipline (BENCH_J1B_STAGES_r12): the nation NAMES are
    # needed only in the 4-combination output grain, so the fact probes
    # and the fact⋈fact shuffle carry int nation keys; names attach to
    # the post-agg frame via the 25-row nation dim, twice.
    nk = t["nation"].filter(F.col("n_name").isin(n1, n2)).select(
        "n_nationkey", "n_name"
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(nk), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_nationkey").alias("supp_nk"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(nk), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_nationkey").alias("cust_nk"))
    )
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    li = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    ords = t["orders"].join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    per_key = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nk") != F.col("cust_nk"))
        .groupBy(
            "supp_nk",
            "cust_nk",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
    sn = nk.select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = nk.select(
        F.col("n_nationkey").alias("cust_nk"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        per_key.join(F.broadcast(sn), "supp_nk")
        .join(F.broadcast(cn), "cust_nk")
        .select("supp_nation", "cust_nation", "ship_year", "revenue")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM lineitem, orders, supplier, customer, nation n1, nation n2
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND o_custkey = c_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8-shape — national market share: a 6-table star with region/part
# filters and a conditional-share rollup per year (double division of two
# exact decimal sums).
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    cust_in_region = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    # Int-key discipline (BENCH_J1B_STAGES_r12): the only use of the
    # supplier's nation NAME is an equality test against one literal, so
    # evaluate it dim-side and broadcast (s_suppkey, boolean) — the string
    # never rides the lineitem probe.
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            (F.col("n_name") == "NATION_3").alias("is_target_nation"),
        )
    )
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    base = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    sums = base.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.sum(
            F.when(F.col("is_target_nation"), revenue).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("nation_dec"),
        F.sum(revenue).alias("total_dec"),
    )
    return sums.select(
        "order_year",
        (F.col("nation_dec").cast("double") / F.col("total_dec").cast("double")).alias("mkt_share"),
        F.col("total_dec").cast("double").alias("total_revenue"),
    )


Q8_SQL = """
WITH base AS (
  SELECT EXTRACT(year FROM o_orderdate) AS order_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem, part, orders, supplier, nation n2
  WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
    AND s_nationkey = n2.n_nationkey
    AND p_type = 'ECONOMY'
    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    AND EXISTS (
      SELECT 1 FROM customer, nation n1, region
      WHERE c_custkey = o_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA')
)
SELECT CAST(order_year AS INT) AS order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue
FROM base GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q15-shape — top supplier(s) by quarterly revenue: scalar-subquery-on-
# aggregate (revenue == MAX(revenue)) — equality tested on the EXACT
# decimal sum, so ties and the max compare identically cross-engine.
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    revenue = _money(F.col("l_extendedprice")) * _rate(F.lit(1) - F.col("l_discount"))
    per_supp = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("rev_dec"))
    )
    w = Window.partitionBy()
    best = per_supp.withColumn("max_dec", F.max("rev_dec").over(w)).filter(
        F.col("rev_dec") == F.col("max_dec")
    )
    return (
        best.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS supp_key, s_name AS supp_name,
       CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q13-shape — customer order-count distribution: LEFT join so zero-order
# customers survive, then a histogram of the counts (agg-of-agg). The
# per-customer rollup reduces the fact before anything joins it (the j1
# fallback plan is mandatory here — the output grain forces it).
# ---------------------------------------------------------------------------

def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.star_layout import maybe_custdist_rollup, maybe_star_layout

    # Aggregate awareness (round 15): q13's whole answer is precomputed
    # as the ~40-row custdist histogram (star_layout.
    # ensure_custdist_rollup — two-level: a foldable per-customer count
    # base + the derived histogram incl. the zero bucket). Ladder:
    # rollup → bucketed layout → raw; same oracle throughout.
    hist = maybe_custdist_rollup(spark, sf_dir)
    if hist is not None:
        return spark.table(hist).orderBy(
            F.desc("custdist"), F.desc("c_count")
        )
    # Layout awareness — see j1_join_agg: route to the engine-owned
    # bucketed layout when it exists and is verifiably fresh; q13b
    # shares this query's oracle. Silent fallback, never builds.
    if maybe_star_layout(spark, sf_dir) is not None:
        return q13b_custdist_bucketed(spark, sf_dir)

    t = load_testdata(spark, sf_dir)
    per_cust = t["orders"].groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("c_count")
    )
    # per_cust is CUSTOMER-cardinality (two ints per customer), so the
    # dim-budget gate applies to it exactly as to the customer table: when
    # customer fits the broadcast budget so does this aggregate, and the
    # left join runs without shuffling the customer side.
    if table_disk_bytes(sf_dir, "customer") <= DIM_BROADCAST_BUDGET:
        per_cust = F.broadcast(per_cust)
    counts = (
        t["customer"]
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS c_count
  FROM customer LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
  ) o ON c_custkey = o.o_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q13b_custdist_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 on the engine-owned bucketed star layout — the remaining
    member of j1's "fact-agg exchange class" (the 1.5M-key per-customer
    COUNT was the measured cost at sf10: 1.7-2.0 s vs DuckDB 0.11). Both
    the orders table and the customer map are bucketed+sorted on the
    customer key (plans/star_layout.py), so the per-customer COUNT is
    bucket-local (HashAggregate directly over the bucketed scan, no
    exchange) and the zero-preserving left join to customers is a
    bucket-local SHJ — the only exchanges left are the tiny c_count
    histogram grain and the final sort. Same DuckDB oracle as q13.
    """
    from ..plans.star_layout import ensure_star_layout

    orders_tbl, custmap_tbl = ensure_star_layout(spark, sf_dir)
    per_cust = (
        spark.table(orders_tbl)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
        .hint("shuffle_hash")
    )
    counts = (
        spark.table(custmap_tbl)
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# ZO1 — box-predicate rollup on the engine-owned Z-ORDERED layout
# (plans/star_layout.ensure_zorder_layout + operators/zorder.py): orders
# clustered along the Morton curve of (o_custkey, o_orderdate), so this
# two-sided box prunes parquet row groups on BOTH columns via plain
# min/max stats — single-column sort prunes only its own column. Same
# oracle as the identical filter over raw parquet: the layout is
# content-identical, only the physical order changes.
# ---------------------------------------------------------------------------

def zo1_zorder_box_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.star_layout import ensure_zorder_layout

    tbl = ensure_zorder_layout(spark, sf_dir)
    o = spark.table(tbl)
    return (
        o.filter(
            (F.col("o_custkey") >= 100)
            & (F.col("o_custkey") <= 500)
            & (F.col("o_orderdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-09-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money(F.col("o_totalprice")))
            .cast("double")
            .alias("total_spend"),
        )
    )


ZO1_SQL = """
SELECT o_orderstatus AS order_status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders
WHERE o_custkey BETWEEN 100 AND 500
  AND o_orderdate >= TIMESTAMP '1996-03-01'
  AND o_orderdate < TIMESTAMP '1996-09-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q17-shape — small-quantity-order revenue: a correlated AVG subquery
# (l_quantity < 0.5 * avg(l_quantity) per part) decorrelated into a
# per-part aggregate joined back to the fact. The threshold compare uses
# the exact decimal avg-halving (sum/2/count as decimal math both sides)
# so the boundary is engine-stable.
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    li = t["lineitem"]
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    # The correlated "qty < avg(qty)/2" threshold decorrelates to a
    # per-part aggregate; the compare is cross-multiplied into pure
    # INTEGER arithmetic (quantities are integral):
    #   qty < sum/(2*cnt)  <=>  qty * 2 * cnt < sum
    # so the boundary is bit-exact in any engine — no decimal-division
    # scale rules involved.
    # Restrict lineitem to the brand's parts FIRST (broadcast semi —
    # every lineitem row of a selected part survives, so the per-part
    # average is unchanged): the decorrelated aggregate then runs over
    # ~4% of the fact and the threshold join is a broadcast, not a 60M-row
    # shuffle (measured sf10: 4.9 s -> 1.5 s, 1.15x DuckDB).
    brand_li = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = brand_li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    return (
        brand_li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .filter(
            F.col("l_quantity").cast("bigint") * 2 * F.col("qty_cnt")
            < F.col("qty_sum")
        )
        .groupBy()
        .agg(
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
         COUNT(*) AS qty_cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
JOIN per_part ON l_partkey = pk
WHERE CAST(l_quantity AS BIGINT) * 2 * qty_cnt < qty_sum
"""


# ---------------------------------------------------------------------------
# Q18-shape — large-volume orders: aggregate-then-semijoin (HAVING on the
# fact's own rollup feeds a key filter back into the join). The qty rollup
# and the order join share the orderkey shuffle; customer broadcasts.
# ---------------------------------------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("cust_name"),
            F.col("c_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            _money(F.col("o_totalprice")).cast("double").alias("total_price"),
            F.col("total_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("order_key"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name AS cust_name, c_custkey AS cust_key, o_orderkey AS order_key,
       o_orderdate AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       big.total_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, order_key ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# W5 — ntile bucketing (beyond-reference; deterministic given a total
# order, so it cross-checks exactly)
# ---------------------------------------------------------------------------

def w5_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_testdata(spark, sf_dir)["customer"]
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            F.col("c_nationkey").alias("nation_key"),
            F.ntile(4).over(w).alias("balance_quartile"),
            _money(F.col("c_acctbal")).cast("double").alias("acctbal"),
        )
        .groupBy("nation_key", "balance_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.max("acctbal").alias("max_bal"),
            F.min("acctbal").alias("min_bal"),
        )
    )


W5_SQL = """
WITH q AS (
  SELECT c_nationkey AS nation_key,
         NTILE(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal DESC, c_custkey ASC) AS balance_quartile,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
  FROM customer
)
SELECT nation_key, balance_quartile, COUNT(*) AS n_custs,
       MAX(acctbal) AS max_bal, MIN(acctbal) AS min_bal
FROM q GROUP BY nation_key, balance_quartile
"""


# ---------------------------------------------------------------------------
# T5b — ordered string aggregation (E15 listagg; DuckDB string_agg ORDER BY
# oracle compares the exact concatenated strings)
# ---------------------------------------------------------------------------

def t5_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stdlib import listagg

    c = load_testdata(spark, sf_dir)["customer"].filter(F.col("c_custkey") % 50 == 0)
    return c.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        listagg(F.col("c_name"), ",", order_by=F.col("c_custkey")).alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


T5B_SQL = """
SELECT c_nationkey AS nation_key,
       string_agg(c_name, ',' ORDER BY c_custkey) AS names,
       COUNT(*) AS n
FROM customer WHERE c_custkey % 50 = 0
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# EV6 — weekly retention cohorts: users grouped by first-activity ISO week,
# retention measured as the share of the cohort active in each later week.
# The standard product-analytics rollup (no reference analog — events
# extension family, like EV1-EV5).
#
# Scale shape (100 TB): two partial-agg passes over events (first-touch
# min per user; distinct (user, week)) that shuffle on user_id and can
# share the exchange; the cohort join is per-user (skinny), and the final
# rollup is |cohorts × offsets| rows — tiny. cohort_size is
# broadcast-joined. retention_rate is a single bigint/bigint IEEE division,
# bit-identical cross-engine (no rounding needed).
# ---------------------------------------------------------------------------

def ev6_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    offsets = active.join(first, "user_id").select(
        "cohort_week",
        (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
    )
    cohort_size = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    ret = offsets.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users")
    )
    return ret.join(F.broadcast(cohort_size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        "cohort_users",
        (
            F.col("active_users").cast("double")
            / F.col("cohort_users").cast("double")
        ).alias("retention_rate"),
    )


EV6_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
), offs AS (
  SELECT f.cohort_week,
         CAST((a.act_week - f.cohort_week) / 7 AS INTEGER) AS week_offset
  FROM active a JOIN first f USING (user_id)
), size_ AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users FROM first GROUP BY 1
), ret AS (
  SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS active_users
  FROM offs GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, r.active_users, s.cohort_users,
       CAST(r.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE) AS retention_rate
FROM ret r JOIN size_ s USING (cohort_week)
"""


# ---------------------------------------------------------------------------
# EV7 — event-sequence transition matrix (first-order Markov over each
# user's event stream): the sequence-mining shape behind journey analytics
# and next-event models. One lag window partitioned by user_id (the
# per-key window class — high-cardinality key, no hot partition), then a
# 25-cell rollup; transition probabilities are int/int double divisions
# so both engines agree exactly.
# ---------------------------------------------------------------------------

def ev7_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double")
        ).alias("p_transition"),
    )


EV7_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE) AS p_transition
FROM counts
"""


# ---------------------------------------------------------------------------
# EV1C — sessionization via Spark's BUILT-IN session_window grouping
# (operators/sessionize.py:session_window_stats): the Catalyst-native
# merge-in-aggregation formulation, cross-checked against the lag-window
# oracle.
# Boundary semantics: session_window starts a NEW session when the gap is
# >= the window gap (windows are half-open), hence the oracle's >= flag —
# one boundary case stricter than EV1's lag > formulation.
# ---------------------------------------------------------------------------

def ev1c_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import session_window_stats

    ev = load_testdata(spark, sf_dir)["events"]
    s = session_window_stats(ev, gap="30 minutes")
    return s.select(
        "user_id",
        ts_us("session_start").alias("session_start_us"),
        ts_us("session_end_ts").alias("session_end_us"),
        "n_events",
    )


EV1C_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS flag
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(flag) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
"""


REGISTRY = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    # q1 on the cents-enriched lineitem layout — same oracle, so the
    # routed path (q1 routes here when the layout exists) is always
    # hash-checked against the raw-arithmetic answer.
    "q1b_pricing_summary_layout": (q1b_pricing_summary_layout, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q6_revenue_forecast": (q6_revenue_forecast, Q6_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_custdist": (q13_custdist, Q13_SQL),
    "q13b_custdist_bucketed": (q13b_custdist_bucketed, Q13_SQL),
    "zo1_zorder_box_filter": (zo1_zorder_box_filter, ZO1_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "p1_projection_cast": (p1_projection_cast, P1_SQL),
    "p2_filter_ilike": (p2_filter_ilike, P2_SQL),
    "p3_case_classify": (p3_case_classify, P3_SQL),
    "p5_coalesce": (p5_coalesce, P5_SQL),
    "j1_join_agg": (j1_join_agg, J1_SQL),
    # Engine-owned bucketed-layout variants (plans/star_layout.py): same
    # oracles as j1/w3, exchange-free join physical contract.
    "j1b_join_agg_bucketed": (j1b_join_agg_bucketed, J1_SQL),
    "w3b_pct_of_total_bucketed": (w3b_pct_of_total_bucketed, W3_SQL),
    "j2_left_join": (j2_left_join, J2_SQL),
    "j3_top1_per_group": (j3_top1_per_group, J3_SQL),
    "j3b_regex_lateral_top1": (j3b_regex_lateral_top1, J3B_SQL),
    "j4_lateral_expr": (j4_lateral_expr, J4_SQL),
    "j5_explode_split": (j5_explode_split, J5_SQL),
    "a1_multi_grain_rollup": (a1_multi_grain_rollup, A1_SQL),
    "a3_conditional_agg": (a3_conditional_agg, A3_SQL),
    "w4_running_total": (w4_running_total, W4_SQL),
    "w5_ntile": (w5_ntile, W5_SQL),
    "a4_count_distinct": (a4_count_distinct, A4_SQL),
    "w1_dedup_rank": (w1_dedup_rank, W1_SQL),
    "w2_first_value": (w2_first_value, W2_SQL),
    "w3_pct_of_total": (w3_pct_of_total, W3_SQL),
    "u1_union_dedup": (u1_union_dedup, U1_SQL),
    "u2_union_all_dim": (u2_union_all_dim, U2_SQL),
    "g1_date_spine": (g1_date_spine, G1_SQL),
    "d1_date_trunc": (d1_date_trunc, D1_SQL),
    "d2_extract": (d2_extract, D2_SQL),
    "d3_interval_arith": (d3_interval_arith, D3_SQL),
    "t2_regex_match": (t2_regex_match, T2_SQL),
    "t4_string_fns": (t4_string_fns, T4_SQL),
    "t5_listagg": (t5_listagg, T5B_SQL),
    "t3_normalize": (t3_normalize, T3_SQL),
    "so1_order_limit": (so1_order_limit, SO1_SQL),
    "ev1_sessionize": (ev1_sessionize, EV1_SQL),
    "ev1b_sessionize_bucketed": (ev1b_sessionize_bucketed, EV1B_SQL),
    "ev2_json_extract": (ev2_json_extract, EV2_SQL),
    "ev3_asof_join": (ev3_asof_join, EV3_SQL),
    "ev3b_asof_forward": (ev3b_asof_forward, EV3B_SQL),
    "ev4_range_join": (ev4_range_join, EV4_SQL),
    "ev5_funnel": (ev5_funnel, EV5_SQL),
    "ev5b_funnel_steps": (ev5b_funnel_steps, EV5B_SQL),
    "ev6_retention_cohorts": (ev6_retention_cohorts, EV6_SQL),
    "ev7_event_transitions": (ev7_event_transitions, EV7_SQL),
    "ev1c_session_window": (ev1c_session_window, EV1C_SQL),
    "a5_cube": (a5_cube, A5_SQL),
    "a6_grouping_sets": (a6_grouping_sets, A6_SQL),
    "p6_pivot": (p6_pivot, P6_SQL),
    "u3_except_intersect": (u3_except_intersect, U3_SQL),
    "u4_except_intersect_all": (u4_except_intersect_all, U4_SQL),
    "w8_lag_lead_ignore_nulls": (w8_lag_lead_ignore_nulls, W8_SQL),
    "w6_range_frame": (w6_range_frame, W6_SQL),
    "w7_analytic_suite": (w7_analytic_suite, W7_SQL),
    "a2_rollup": (a2_rollup, A2_SQL),
    "f1_percentiles": (f1_percentiles, F1_SQL),
    "f4_profile": (f4_profile, F4_SQL),
}
