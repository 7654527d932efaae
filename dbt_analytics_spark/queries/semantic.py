"""Semantic-layer queries under the DuckDB oracle gate.

The semantic layer (plans/semantics.py — the Spark-native execution half
of dbt's semantic_models/metrics YAML, whose reference implementation is
the closed MetricFlow service; dbt-core only parses the YAML at
SP/dbt/parser/schemas.py) has so far been pytest-evidenced only. These
queries run REAL metric requests — entity-join star group-bys, filtered
and ratio metrics, cumulative (all-time / grain-to-date / trailing
window) and conversion metrics, and the saved-query path — over the
driver testdata and hash-check the compiled Spark aggregation against
hand-written ANSI SQL.

Exactness follows queries/core.py's rules: money measures aggregate as
DECIMAL(18,2) (exact, order-independent addition) inside the layer via
measure exprs, the builders cast the final metric columns to DOUBLE and
time buckets to DATE, and the oracles mirror both casts.

Scale: every query compiles to ONE Spark aggregation (the layer's core
contract) — entity joins ship a pruned (pk + dims) build side that
Catalyst/AQE broadcast; cumulative metrics add one window over the
already-aggregated (tiny) bucket frame; the conversion metric is a keyed
left-semi equi-join on the entity, never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import Project
from ..plans.semantics import SemanticLayer
from ..sources import load_testdata

#: One schema-file document (dbt YAML shapes) covering the driver star
#: schema: an orders fact model joined to a customer dimension model
#: through a foreign entity, and an events model for conversion metrics.
_DOC = {
    "semantic_models": [
        {
            "name": "orders_sm",
            "model": "ref('orders')",
            "entities": [
                {"name": "order", "type": "primary", "expr": "o_orderkey"},
                {"name": "customer", "type": "foreign", "expr": "o_custkey"},
            ],
            "dimensions": [
                {"name": "order_status", "expr": "o_orderstatus"},
                {
                    "name": "order_date",
                    "type": "time",
                    "expr": "o_orderdate",
                    "grain": "day",
                },
            ],
            "measures": [
                {
                    "name": "order_revenue",
                    "agg": "sum",
                    "expr": "CAST(o_totalprice AS DECIMAL(18,2))",
                },
                {"name": "n_orders", "agg": "count"},
                {
                    "name": "avg_price",
                    "agg": "avg",
                    "expr": "CAST(o_totalprice AS DECIMAL(18,2))",
                },
                {
                    "name": "max_price",
                    "agg": "max",
                    "expr": "CAST(o_totalprice AS DECIMAL(18,2))",
                },
                {
                    # Distributional aggs (round 11): MetricFlow's
                    # sum_boolean / median / percentile measure types.
                    "name": "n_urgent",
                    "agg": "sum_boolean",
                    "expr": "o_orderpriority = '1-URGENT'",
                },
                {"name": "median_price", "agg": "median", "expr": "o_totalprice"},
                {
                    "name": "p90_price",
                    "agg": "percentile",
                    "expr": "o_totalprice",
                    "agg_params": {"percentile": 0.9},
                },
                {
                    "name": "p90_price_disc",
                    "agg": "percentile",
                    "expr": "o_totalprice",
                    "agg_params": {
                        "percentile": 0.9,
                        "use_discrete_percentile": True,
                    },
                },
                {
                    # Semi-additive (round 11): per customer, only the
                    # LATEST order's value counts within each bucket.
                    "name": "latest_order_value",
                    "agg": "sum",
                    "expr": "CAST(o_totalprice AS DECIMAL(18,2))",
                    "non_additive_dimension": {
                        "name": "order_date",
                        "window_choice": "max",
                        "window_groupings": ["customer"],
                    },
                },
            ],
        },
        {
            "name": "customers_sm",
            "model": "ref('customer')",
            "entities": [
                {"name": "customer", "type": "primary", "expr": "c_custkey"},
                {"name": "nation", "type": "foreign", "expr": "c_nationkey"},
            ],
            "dimensions": [
                {"name": "c_mktsegment"},
                {"name": "c_nationkey"},
            ],
            "measures": [{"name": "n_customers", "agg": "count"}],
        },
        {
            "name": "nations_sm",
            "model": "ref('nation')",
            "entities": [
                {"name": "nation", "type": "primary", "expr": "n_nationkey"}
            ],
            "dimensions": [{"name": "n_name"}],
            "measures": [{"name": "n_nations", "agg": "count"}],
        },
        {
            "name": "events_sm",
            "model": "ref('events')",
            "entities": [
                {"name": "event", "type": "primary", "expr": "event_id"},
                {"name": "user", "type": "foreign", "expr": "user_id"},
            ],
            "dimensions": [
                {
                    "name": "event_ts",
                    "type": "time",
                    "expr": "ts",
                    "grain": "day",
                }
            ],
            "measures": [
                {
                    "name": "views",
                    "agg": "count",
                    "expr": "CASE WHEN event_type = 'view' THEN 1 END",
                },
                {
                    "name": "purchases",
                    "agg": "count",
                    "expr": "CASE WHEN event_type = 'purchase' THEN 1 END",
                },
            ],
        },
    ],
    "metrics": [
        {"name": "revenue", "type": "simple", "measure": "order_revenue"},
        {"name": "order_count", "type": "simple", "measure": "n_orders"},
        {"name": "urgent_orders", "type": "simple", "measure": "n_urgent"},
        {"name": "median_order_price", "type": "simple", "measure": "median_price"},
        {"name": "p90_order_price", "type": "simple", "measure": "p90_price"},
        {
            "name": "p90_order_price_disc",
            "type": "simple",
            "measure": "p90_price_disc",
        },
        {
            # Cumulative over a sum_boolean measure: bucket partials are
            # plain counts, so the running re-sum decomposes exactly.
            "name": "cum_urgent_orders",
            "type": "cumulative",
            "measure": "n_urgent",
        },
        {
            # Filtered metric: compiles to a conditional aggregate inside
            # the SAME groupBy (never a second scan).
            "name": "big_order_revenue",
            "type": "simple",
            "measure": "order_revenue",
            "filter": "o_totalprice > 400000",
        },
        {
            "name": "avg_order_value",
            "type": "ratio",
            "type_params": {"numerator": "revenue", "denominator": "order_count"},
        },
        {
            # Simple metric over an AVG measure (vs the ratio above):
            # rollup-routable as a (sum, count) partial pair (sem17).
            "name": "mean_order_price",
            "type": "simple",
            "measure": "avg_price",
        },
        {
            "name": "cum_revenue",
            "type": "cumulative",
            "measure": "order_revenue",
        },
        {
            "name": "ytd_revenue",
            "type": "cumulative",
            "measure": "order_revenue",
            "type_params": {"grain_to_date": "year"},
        },
        {
            "name": "revenue_7d",
            "type": "cumulative",
            "measure": "order_revenue",
            "type_params": {"window": "7 days"},
        },
        {
            # Measure-input params (MetricFlow): the bucket frame extends
            # to every month between min and max, gap months fill with 0.
            "name": "rev_gap",
            "type": "simple",
            "type_params": {
                "measure": {
                    "name": "order_revenue",
                    "fill_nulls_with": 0,
                    "join_to_timespine": True,
                }
            },
        },
        {
            # Period-over-period: aliased offset input reads rev_gap from
            # the bucket one month earlier (a TIME shift on the spine).
            "name": "rev_mom",
            "type": "derived",
            "type_params": {
                "expr": "rev_gap - prev_rev",
                "metrics": [
                    {"name": "rev_gap"},
                    {
                        "name": "rev_gap",
                        "alias": "prev_rev",
                        "offset_window": "1 month",
                    },
                ],
            },
        },
        {
            # Calendar window (round 10): months are not fixed-length, so
            # this compiles to a bucket-frame self-join on
            # (b - INTERVAL 2 MONTH, b], not a RANGE frame.
            "name": "revenue_2mo",
            "type": "cumulative",
            "measure": "order_revenue",
            "type_params": {"window": "2 months"},
        },
        {
            # Derived over a RATIO input (round 10 — MetricFlow allows
            # derived metrics over any metric type).
            "name": "aov_x100",
            "type": "derived",
            "type_params": {"expr": "avg_order_value * 100"},
        },
        {
            # Derived over a DERIVED input (nested substitution).
            "name": "aov_index",
            "type": "derived",
            "type_params": {"expr": "aov_x100 / 100 + order_count"},
        },
        {
            "name": "view_to_purchase_7d",
            "type": "conversion",
            "type_params": {
                "conversion_type_params": {
                    "base_measure": "views",
                    "conversion_measure": "purchases",
                    "entity": "user_id",
                    "window": "7 days",
                }
            },
        },
        {
            # Cumulative AVG (round 11): decomposes into accumulated
            # bucket (sum, count) partials divided — MetricFlow's
            # fact-grain avg, never avg-of-bucket-avgs.
            "name": "cum_avg_order",
            "type": "cumulative",
            "measure": "avg_price",
        },
        {
            # Calendar-window cumulative avg: bucket-frame self-join on
            # (b - INTERVAL 3 MONTH, b], partials re-aggregated inside.
            "name": "avg_3mo",
            "type": "cumulative",
            "measure": "avg_price",
            "type_params": {"window": "3 months"},
        },
        {
            # Cumulative MAX: bucket maxes re-aggregate exactly.
            "name": "cum_max_order",
            "type": "cumulative",
            "measure": "max_price",
        },
        {
            # Conversion with constant_properties (round 11): the
            # purchase must land on the SAME calendar day as the view —
            # an extra equi-join key beside the entity.
            "name": "same_day_purchases",
            "type": "conversion",
            "type_params": {
                "conversion_type_params": {
                    "base_measure": "views",
                    "conversion_measure": "purchases",
                    "entity": "user_id",
                    "window": "2 days",
                    "calculation": "conversions",
                    "constant_properties": [
                        {
                            "base_property": "CAST(ts AS DATE)",
                            "conversion_property": "CAST(ts AS DATE)",
                        }
                    ],
                }
            },
        },
        {
            # Semi-additive metric over the non_additive_dimension
            # measure (round 11).
            "name": "eom_order_value",
            "type": "simple",
            "measure": "latest_order_value",
        },
        {
            # offset_to_grain (round 11): each day's revenue vs the
            # value at its MONTH's first bucket.
            "name": "rev_vs_month_start",
            "type": "derived",
            "type_params": {
                "expr": "revenue - som_rev",
                "metrics": [
                    {"name": "revenue"},
                    {
                        "name": "revenue",
                        "alias": "som_rev",
                        "offset_to_grain": "month",
                    },
                ],
            },
        },
    ],
    "saved_queries": [
        {
            "name": "segment_kpis",
            "query_params": {
                "metrics": ["revenue", "order_count"],
                "group_by": ["customer__c_mktsegment"],
                "where": ["o_orderstatus = 'F'"],
            },
        }
    ],
}


def _layer(spark: SparkSession, sf_dir: str) -> SemanticLayer:
    t = load_testdata(spark, sf_dir)
    p = Project(spark, name="sem_driver")
    for name in ("orders", "customer", "nation", "events"):
        p.source_table(name, t[name])
    sl = SemanticLayer(p)
    sl.load(_DOC)
    return sl


def _finish(df: DataFrame, dates: list[str] = (), doubles: list[str] = ()) -> DataFrame:
    """Canonical output types (core.py rules): time buckets as DATE, exact
    decimal metric sums as DOUBLE."""
    for c in dates:
        df = df.withColumn(c, F.col(c).cast("date"))
    for c in doubles:
        df = df.withColumn(c, F.col(c).cast("double"))
    return df


# ---------------------------------------------------------------------------
# sem1 — entity-join star metrics: local dim + foreign entity__dim group-by,
# plain / filtered / ratio metrics in one compiled aggregation.
# ---------------------------------------------------------------------------

def sem1_entity_star_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric request grouped by a LOCAL dimension and a cross-model
    ``entity__dim`` (MetricFlow single-hop join resolution): one LEFT star
    join with a pruned (pk, dim) build side, then ONE aggregation carrying
    a plain sum, a count, a filtered sum, and a post-agg ratio."""
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["revenue", "order_count", "big_order_revenue", "avg_order_value"],
        group_by=["customer__c_mktsegment", "order_status"],
    )
    return _finish(
        df, doubles=["revenue", "big_order_revenue", "avg_order_value"]
    )


SEM1_SQL = """
SELECT
  c.c_mktsegment AS customer__c_mktsegment,
  o.o_orderstatus AS order_status,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS order_count,
  CAST(SUM(CASE WHEN o.o_totalprice > 400000
                THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
    AS big_order_revenue,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS avg_order_value
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# sem2 — cumulative metrics: all-time running total and grain_to_date
# (yearly restart) over monthly buckets.
# ---------------------------------------------------------------------------

def sem2_cumulative_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue beside its all-time cumulative and year-to-date
    variants — the accumulation windows run over the ALREADY-aggregated
    bucket frame (tiny), never the raw fact rows."""
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["revenue", "cum_revenue", "ytd_revenue"],
        group_by=["order_date__month"],
    )
    return _finish(
        df,
        dates=["order_date__month"],
        doubles=["revenue", "cum_revenue", "ytd_revenue"],
    )


SEM2_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('month', o_orderdate) AS mo,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  GROUP BY 1
)
SELECT
  CAST(mo AS DATE) AS order_date__month,
  CAST(rev AS DOUBLE) AS revenue,
  CAST(SUM(rev) OVER (ORDER BY mo) AS DOUBLE) AS cum_revenue,
  CAST(SUM(rev) OVER (PARTITION BY date_trunc('year', mo) ORDER BY mo)
       AS DOUBLE) AS ytd_revenue
FROM buckets
"""


# ---------------------------------------------------------------------------
# sem3 — trailing-window cumulative: RANGE frame on epoch days, so GAPS in
# the bucket sequence cannot stretch the window (a ROWS frame would).
# ---------------------------------------------------------------------------

def sem3_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(["revenue", "revenue_7d"], group_by=["order_date"])
    return _finish(
        df, dates=["order_date"], doubles=["revenue", "revenue_7d"]
    )


SEM3_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('day', o_orderdate) AS dy,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  GROUP BY 1
)
SELECT
  CAST(dy AS DATE) AS order_date,
  CAST(rev AS DOUBLE) AS revenue,
  CAST(SUM(rev) OVER (
         ORDER BY datediff('day', DATE '1970-01-01', dy)
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS revenue_7d
FROM buckets
"""


# ---------------------------------------------------------------------------
# sem4 — conversion metric: share of base events (views) with a conversion
# event (purchase) for the same entity within 7 days, bucketed daily (the
# driver events table spans ~30 days, so day grain gives a multi-row
# output; the trailing edge days show the window's right-censoring).
# ---------------------------------------------------------------------------

def sem4_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt conversion metric: keyed LEFT-SEMI equi-join on the entity with
    the time window as a post-match predicate — each base event counts
    once however many conversions land, and there is no cross product."""
    sl = _layer(spark, sf_dir)
    df = sl.query(["view_to_purchase_7d"], group_by=["event_ts"])
    return _finish(
        df, dates=["event_ts"], doubles=["view_to_purchase_7d"]
    )


SEM4_SQL = """
WITH base AS (
  SELECT user_id, ts, date_trunc('day', ts) AS dy
  FROM events WHERE event_type = 'view'
),
conv AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
flagged AS (
  SELECT
    b.dy,
    EXISTS (
      SELECT 1 FROM conv c
      WHERE c.user_id = b.user_id
        AND c.ts >= b.ts
        AND c.ts <= b.ts + INTERVAL 7 DAY
    ) AS converted
  FROM base b
)
SELECT
  CAST(dy AS DATE) AS event_ts,
  CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS view_to_purchase_7d
FROM flagged
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sem5 — saved query: a named, reusable metric request (dbt saved_queries)
# with a where filter, executed through the run_saved path.
# ---------------------------------------------------------------------------

def sem5_saved_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.run_saved("segment_kpis")
    return _finish(df, doubles=["revenue"])


SEM5_SQL = """
SELECT
  c.c_mktsegment AS customer__c_mktsegment,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS order_count
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sem6 — join_to_timespine + fill_nulls_with + derived offset_window: the
# where-filter empties some months entirely (11 of 80 at sf0.01, 66 at
# sf0.001), so the spine must SYNTHESIZE those buckets, the fill must zero
# them, and the month-over-month offset must read through them by TIME
# (a ROWS lag would skip across the gaps and read the wrong month).
# ---------------------------------------------------------------------------

def sem6_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["rev_gap", "rev_mom"],
        group_by=["order_date__month"],
        where="o_totalprice > 495000",
    )
    return _finish(
        df, dates=["order_date__month"], doubles=["rev_gap", "rev_mom"]
    )


SEM6_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('month', o_orderdate) AS mo,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_totalprice > 495000
  GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series(
    (SELECT min(mo) FROM buckets),
    (SELECT max(mo) FROM buckets),
    INTERVAL 1 MONTH)) AS mo
),
filled AS (
  SELECT s.mo, b.rev FROM spine s LEFT JOIN buckets b ON b.mo = s.mo
)
SELECT
  CAST(f.mo AS DATE) AS order_date__month,
  CAST(COALESCE(f.rev, 0) AS DOUBLE) AS rev_gap,
  CAST(COALESCE(f.rev, 0) - COALESCE(p.rev, 0) AS DOUBLE) AS rev_mom
FROM filled f
LEFT JOIN filled p ON p.mo + INTERVAL 1 MONTH = f.mo
"""


# ---------------------------------------------------------------------------
# sem7 — the metricflow_time_spine CALENDAR path: when the project defines
# dbt's conventional calendar model, its rows (grain-truncated, deduped,
# clipped to the observed window) replace the sequence() spine — calendar
# HOLES are respected (not synthesized) and out-of-window calendar years
# are clipped. The calendar here is every month 1990-2000 EXCEPT March and
# September (deterministic holes), so the result must contain exactly the
# non-hole months within the data's [min, max] window.
# ---------------------------------------------------------------------------

def sem7_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    cal = spark.sql(
        """
        SELECT explode(sequence(DATE '1990-01-01', DATE '2000-12-01',
                                INTERVAL 1 MONTH)) AS date_day
        """
    ).filter(~F.month("date_day").isin(3, 9))
    sl.project.source_table("metricflow_time_spine", cal)
    df = sl.query(
        ["rev_gap"],
        group_by=["order_date__month"],
        where="o_totalprice > 495000",
    )
    return _finish(df, dates=["order_date__month"], doubles=["rev_gap"])


SEM7_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('month', o_orderdate) AS mo,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_totalprice > 495000
  GROUP BY 1
),
calendar AS (
  SELECT unnest(generate_series(
    TIMESTAMP '1990-01-01', TIMESTAMP '2000-12-01',
    INTERVAL 1 MONTH)) AS mo
),
spine AS (
  SELECT c.mo FROM calendar c
  WHERE month(c.mo) NOT IN (3, 9)
    AND c.mo >= (SELECT min(mo) FROM buckets)
    AND c.mo <= (SELECT max(mo) FROM buckets)
)
SELECT
  CAST(s.mo AS DATE) AS order_date__month,
  CAST(COALESCE(b.rev, 0) AS DOUBLE) AS rev_gap
FROM spine s LEFT JOIN buckets b ON b.mo = s.mo
"""


# ---------------------------------------------------------------------------
# sem8 — CALENDAR trailing window (round 10, VERDICT r9 item 4): a
# ``window: 2 months`` cumulative at day grain. Months are not
# fixed-length, so the compiler's RANGE frame cannot express it — the
# layer self-joins the (tiny, post-aggregation) bucket frame on
# b2 ∈ (b1 - INTERVAL 2 MONTH, b1], the calendar analog of the day
# path's [b-(N-1), b] frame. MetricFlow accepts week/month/quarter/year
# windows (metricflow cumulative-metric type_params.window); rejecting
# them was a documented pre-r10 divergence.
# ---------------------------------------------------------------------------

def sem8_calendar_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(["revenue", "revenue_2mo"], group_by=["order_date"])
    return _finish(
        df, dates=["order_date"], doubles=["revenue", "revenue_2mo"]
    )


SEM8_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('day', o_orderdate) AS dy,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  GROUP BY 1
)
SELECT
  CAST(b.dy AS DATE) AS order_date,
  CAST(b.rev AS DOUBLE) AS revenue,
  CAST((SELECT SUM(b2.rev) FROM buckets b2
        WHERE b2.dy > b.dy - INTERVAL 2 MONTH
          AND b2.dy <= b.dy) AS DOUBLE) AS revenue_2mo
FROM buckets b
"""


# ---------------------------------------------------------------------------
# sem9 — nested metric inputs (round 10, VERDICT r9 item 4): a derived
# metric over a RATIO input (aov_x100 = avg_order_value * 100) and a
# derived metric over that DERIVED metric (aov_index) — MetricFlow
# allows metric inputs of any type; the pre-r10 simple-only restriction
# was a documented divergence. The compiled expression substitutes each
# referenced metric's full post-aggregation SQL recursively
# (plans/semantics.py _metric_sql), still ONE Spark aggregation.
# ---------------------------------------------------------------------------

def sem9_nested_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["aov_x100", "aov_index"], group_by=["order_status"]
    )
    return _finish(df, doubles=["aov_x100", "aov_index"])


# The oracle mirrors the compiled arithmetic SHAPE exactly (core.py float
# rules: same IEEE ops in the same order on both engines).
SEM9_SQL = """
WITH agg AS (
  SELECT
    o_orderstatus AS order_status,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
    COUNT(*) AS cnt
  FROM orders
  GROUP BY 1
)
SELECT
  order_status,
  CAST(((CAST(rev AS DOUBLE) / CAST(cnt AS DOUBLE)) * 100) AS DOUBLE)
    AS aov_x100,
  CAST((((CAST(rev AS DOUBLE) / CAST(cnt AS DOUBLE)) * 100) / 100 + cnt
       ) AS DOUBLE) AS aov_index
FROM agg
"""


# ---------------------------------------------------------------------------
# sem10 — multi-hop entity chain + MetricFlow filter template (round 10):
# revenue by customer__nation__n_name (orders -> customer -> nation, two
# foreign-entity hops compiled to ONE pruned left join of the assembled
# chain) filtered by a {{ Dimension('customer__c_mktsegment') }} template
# — a dim the group_by does not request, auto-joined hidden.
# ---------------------------------------------------------------------------

def sem10_multihop_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["revenue", "order_count"],
        group_by=["customer__nation__n_name"],
        where="{{ Dimension('customer__c_mktsegment') }} = 'BUILDING'",
    )
    return _finish(df, doubles=["revenue"]).withColumnRenamed(
        "customer__nation__n_name", "nation_name"
    )


SEM10_SQL = """
SELECT
  n.n_name AS nation_name,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS order_count
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sem11 — cumulative avg/min/max (round 11, the last measure-agg rejection):
# avg decomposes into accumulated (sum, count) bucket partials divided —
# exactly MetricFlow's fact-grain avg — and max re-aggregates directly;
# avg_3mo exercises the calendar-window self-join with partial pairs.
# Exactness: partial sums are DECIMAL(18,2) (exact), counts are longs, and
# the division is double/double (IEEE-identical on both engines).
# ---------------------------------------------------------------------------

def sem11_cumulative_avg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["cum_avg_order", "avg_3mo", "cum_max_order"],
        group_by=["order_date__month"],
    )
    return _finish(
        df,
        dates=["order_date__month"],
        doubles=["cum_avg_order", "avg_3mo", "cum_max_order"],
    )


SEM11_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('month', o_orderdate) AS mo,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
    COUNT(CAST(o_totalprice AS DECIMAL(18,2))) AS c,
    MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS mx
  FROM orders
  GROUP BY 1
)
SELECT
  CAST(b.mo AS DATE) AS order_date__month,
  CAST(SUM(b.s) OVER (ORDER BY b.mo) AS DOUBLE)
    / CAST(SUM(b.c) OVER (ORDER BY b.mo) AS DOUBLE) AS cum_avg_order,
  CAST((SELECT SUM(b2.s) FROM buckets b2
        WHERE b2.mo > b.mo - INTERVAL 3 MONTH AND b2.mo <= b.mo) AS DOUBLE)
    / CAST((SELECT SUM(b2.c) FROM buckets b2
        WHERE b2.mo > b.mo - INTERVAL 3 MONTH AND b2.mo <= b.mo) AS DOUBLE)
    AS avg_3mo,
  CAST(MAX(b.mx) OVER (ORDER BY b.mo) AS DOUBLE) AS cum_max_order
FROM buckets b
"""


# ---------------------------------------------------------------------------
# sem12 — conversion constant_properties (round 11): each base view counts
# as converted only if a purchase by the same user lands within 2 days AND
# on the same calendar day (the constant property) — extra equi-join keys
# beside the entity, still a keyed join, never a cross product.
# ---------------------------------------------------------------------------

def sem12_conversion_constant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(["same_day_purchases"], group_by=["event_ts"])
    return _finish(df, dates=["event_ts"])


SEM12_SQL = """
WITH base AS (
  SELECT user_id, ts, CAST(ts AS DATE) AS d, date_trunc('day', ts) AS dy
  FROM events WHERE event_type = 'view'
),
conv AS (
  SELECT user_id, ts, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
)
SELECT
  CAST(b.dy AS DATE) AS event_ts,
  CAST(SUM(CASE WHEN EXISTS (
    SELECT 1 FROM conv c
    WHERE c.user_id = b.user_id
      AND c.d = b.d
      AND c.ts >= b.ts
      AND c.ts <= b.ts + INTERVAL 2 DAY
  ) THEN 1 ELSE 0 END) AS BIGINT) AS same_day_purchases
FROM base b
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sem13 — non_additive_dimension (round 11, MetricFlow semi-additive
# measures): within each month, only each customer's LATEST order value
# counts (window_choice max over order_date per customer entity), then
# summed across customers — beside an ordinary additive count from the
# same model, so the window-choice frame full-outer-joins the single
# groupBy. Compiled as one window (max date over bucket × customer) +
# equality filter (date ties all count) + one aggregation.
# ---------------------------------------------------------------------------

def sem13_semi_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["eom_order_value", "order_count"], group_by=["order_date__month"]
    )
    return _finish(
        df, dates=["order_date__month"], doubles=["eom_order_value"]
    )


SEM13_SQL = """
WITH base AS (
  SELECT date_trunc('month', o_orderdate) AS mo,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         o_orderdate,
         MAX(o_orderdate) OVER (
           PARTITION BY date_trunc('month', o_orderdate), o_custkey
         ) AS mx
  FROM orders
)
SELECT
  CAST(mo AS DATE) AS order_date__month,
  CAST(SUM(CASE WHEN o_orderdate = mx THEN p END) AS DOUBLE)
    AS eom_order_value,
  COUNT(*) AS order_count
FROM base
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sem14 — offset_to_grain (round 11, the last MetricFlow metric-input
# param beside offset_window/alias/filter): each day bucket reads the
# input metric's value at its MONTH's first bucket (vs-start-of-period),
# compiled as a self-join of the tiny bucket frame on
# date_trunc(month, t) = t2. Days whose month-start has no orders read
# NULL (join miss), identically in both engines.
# ---------------------------------------------------------------------------

def sem14_offset_to_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["revenue", "rev_vs_month_start"], group_by=["order_date"]
    )
    return _finish(
        df, dates=["order_date"], doubles=["revenue", "rev_vs_month_start"]
    )


SEM14_SQL = """
WITH buckets AS (
  SELECT
    date_trunc('day', o_orderdate) AS dy,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  GROUP BY 1
)
SELECT
  CAST(b.dy AS DATE) AS order_date,
  CAST(b.rev AS DOUBLE) AS revenue,
  CAST(b.rev - s.rev AS DOUBLE) AS rev_vs_month_start
FROM buckets b
LEFT JOIN buckets s ON s.dy = date_trunc('month', b.dy)
"""


# ---------------------------------------------------------------------------
# sem15 — distributional measure aggs (round 11): MetricFlow sum_boolean,
# median, and percentile (continuous AND discrete) measures in one
# compiled aggregation, plus a cumulative over the sum_boolean measure
# (bucket partials are counts — the running re-sum decomposes exactly).
# Cross-engine exactness probed before wiring: Spark F.median /
# F.percentile / the ceil(p*n) discrete rule bit-match DuckDB median /
# quantile_cont / quantile_disc on this data.
# ---------------------------------------------------------------------------

def sem15_distributional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        [
            "urgent_orders",
            "median_order_price",
            "p90_order_price",
            "p90_order_price_disc",
        ],
        group_by=["order_status"],
    )
    return _finish(
        df,
        doubles=["median_order_price", "p90_order_price", "p90_order_price_disc"],
    )


SEM15_SQL = """
SELECT
  o_orderstatus AS order_status,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
       AS BIGINT) AS urgent_orders,
  CAST(median(o_totalprice) AS DOUBLE) AS median_order_price,
  CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90_order_price,
  CAST(quantile_disc(o_totalprice, 0.9) AS DOUBLE) AS p90_order_price_disc
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sem16 — Metric() filter templates (round 12): a metric-valued where
# filter compiles as a POST-AGGREGATION predicate on the compiled metric
# frame (MetricFlow's outer-query HAVING), here on a RATIO metric's value
# that is not itself in the queried list.
# ---------------------------------------------------------------------------

def sem16_metric_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    sl = _layer(spark, sf_dir)
    df = sl.query(
        ["revenue", "order_count"],
        group_by=["customer__c_mktsegment", "order_status"],
        where="{{ Metric('avg_order_value') }} > 250000",
    )
    return _finish(df, doubles=["revenue"])


SEM16_SQL = """
SELECT
  c.c_mktsegment AS customer__c_mktsegment,
  o.o_orderstatus AS order_status,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS order_count
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
HAVING CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE) > 250000
"""


# ---------------------------------------------------------------------------
# sem17 — aggregate awareness (round 12): the same metric request is
# ROUTED to an engine-maintained rollup (partial sums/counts at
# (order_status, month) grain, plans/semantics.Rollup) and must stay
# bit-identical to the fact-grain oracle — partial decimal sums re-sum
# exactly, counts re-sum, the ratio divides post-agg. The builder raises
# if routing did not happen, so the driver row genuinely exercises the
# rollup path, not the fact fallback.
# ---------------------------------------------------------------------------

def sem17_rollup_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    sl = _layer(spark, sf_dir)
    tag = _re.sub(r"[^A-Za-z0-9]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    sl.materialize_rollup(
        f"sem17_{tag}",
        "orders_sm",
        ["order_status", "order_date__month"],
        # testdata dirs are immutable per round, so a previous session's
        # rollup files are the SAME content — re-register instead of
        # rebuilding (and never leave a catalog-less orphan per run)
        reuse_existing=True,
    )
    df = sl.query(
        # mean_order_price rides an AVG measure: routed as sum+count
        # partials re-divided, cast to the fact-grain avg's exact
        # decimal(22,6) scale (round 13 — avg joined _ROLLUP_COVERABLE)
        ["revenue", "order_count", "avg_order_value", "mean_order_price"],
        group_by=["order_status", "order_date__month"],
    )
    assert sl.last_rollup_used == f"sem17_{tag}", "rollup was not routed"
    return _finish(
        df,
        dates=["order_date__month"],
        doubles=["revenue", "avg_order_value", "mean_order_price"],
    )


SEM17_SQL = """
SELECT
  o_orderstatus AS order_status,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_date__month,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS order_count,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS avg_order_value,
  -- Spark's avg(DECIMAL(18,2)) is the exact rational sum/count rounded
  -- HALF-UP at scale 6 (decimal(22,6)); emulate in integer space: cents
  -- are exact BIGINTs, (2n + c) // (2c) is round-half-up for n >= 0,
  -- and CAST(k AS DOUBLE)/1e6 is the correctly-rounded double of k/1e6
  -- (k < 2^53), matching Spark's decimal->double cast bit-for-bit.
  CAST((SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          * 10000 * 2 + COUNT(*)) // (COUNT(*) * 2) AS DOUBLE) / 1000000.0
    AS mean_order_price
FROM orders
GROUP BY 1, 2
"""


REGISTRY = {
    "sem1_entity_star_metrics": (sem1_entity_star_metrics, SEM1_SQL),
    "sem2_cumulative_metrics": (sem2_cumulative_metrics, SEM2_SQL),
    "sem3_trailing_window": (sem3_trailing_window, SEM3_SQL),
    "sem4_conversion_rate": (sem4_conversion_rate, SEM4_SQL),
    "sem5_saved_query": (sem5_saved_query, SEM5_SQL),
    "sem6_period_over_period": (sem6_period_over_period, SEM6_SQL),
    "sem7_calendar_spine": (sem7_calendar_spine, SEM7_SQL),
    "sem8_calendar_window": (sem8_calendar_window, SEM8_SQL),
    "sem9_nested_derived": (sem9_nested_derived, SEM9_SQL),
    "sem10_multihop_template": (sem10_multihop_template, SEM10_SQL),
    "sem11_cumulative_avg_max": (sem11_cumulative_avg_max, SEM11_SQL),
    "sem12_conversion_constant_props": (
        sem12_conversion_constant_props,
        SEM12_SQL,
    ),
    "sem13_semi_additive": (sem13_semi_additive, SEM13_SQL),
    "sem14_offset_to_grain": (sem14_offset_to_grain, SEM14_SQL),
    "sem15_distributional_aggs": (sem15_distributional_aggs, SEM15_SQL),
    "sem16_metric_filter": (sem16_metric_filter, SEM16_SQL),
    "sem17_rollup_routing": (sem17_rollup_routing, SEM17_SQL),
}
