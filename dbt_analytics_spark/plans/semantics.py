"""Semantic layer: metrics defined once in YAML, queried as DataFrames.

Reference surface: dbt's semantic layer (semantic_models + metrics blocks
in schema YAML, compiled to SQL by MetricFlow — dbt-core only PARSES
these; SP/dbt/parser/schemas.py semantic_models/metrics sections, with
query compilation delegated to the closed MetricFlow service). This
module is the Spark-native equivalent of that missing execution half, so
a project's metric definitions actually RUN here:

- a **semantic model** binds a model/relation to typed *dimensions*
  (categorical, or time with a default grain) and *measures* (agg +
  expr);
- a **metric** is ``simple`` (one measure, optional pre-aggregation
  filter), ``ratio`` (numerator / denominator metrics), or ``derived``
  (an expression over other metrics, evaluated post-aggregation);
- ``SemanticLayer.query(metrics, group_by, where, time_grain)`` compiles
  one Spark aggregation: dimension exprs (time dims date_trunc'd to the
  requested grain), every underlying measure as a conditional aggregate,
  then ratio/derived exprs over the aggregated columns. Catalyst sees a
  single groupBy — partial aggregation, pushdown and AQE all apply, and
  metric filters become ``F.when`` conditions inside the aggregate, so a
  filtered metric never forces a second scan.

Scope (documented divergence): every metric in one query must resolve to
measures of a single semantic model — cross-model entity joins
(MetricFlow's join resolution) are out of scope; define a mart model
joining the entities and hang the semantic model off that instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from .registry import Project

_AGGS = {
    "sum": F.sum,
    "count": F.count,
    "count_distinct": F.countDistinct,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


@dataclass
class Dimension:
    name: str
    type: str = "categorical"  # categorical | time
    expr: str | None = None  # defaults to the dimension name
    grain: str = "day"  # time dims: default date_trunc grain


@dataclass
class Measure:
    name: str
    agg: str = "sum"
    expr: str | None = None  # defaults to the measure name; count: 1


@dataclass
class SemanticModel:
    name: str
    model: str  # node / relation the measures aggregate over
    dimensions: dict[str, Dimension] = field(default_factory=dict)
    measures: dict[str, Measure] = field(default_factory=dict)


@dataclass
class Metric:
    name: str
    type: str  # simple | ratio | derived
    measure: str | None = None  # simple
    filter: str | None = None  # simple: pre-agg row filter
    numerator: str | None = None  # ratio (metric name)
    denominator: str | None = None  # ratio (metric name)
    expr: str | None = None  # derived: over other metric names


@dataclass
class SavedQuery:
    name: str
    metrics: list[str]
    group_by: list[str] = field(default_factory=list)
    where: str | None = None


class SemanticLayer:
    def __init__(self, project: "Project"):
        self.project = project
        self.models: dict[str, SemanticModel] = {}
        self.metrics: dict[str, Metric] = {}
        self.saved_queries: dict[str, SavedQuery] = {}

    # ------------------------------------------------------------------
    # YAML loading (dbt schema-file sections)
    # ------------------------------------------------------------------

    def load(self, doc: dict) -> int:
        """Parse ``semantic_models:`` and ``metrics:`` blocks from one
        schema-file document (dbt YAML shapes; ``model: ref('x')``)."""
        import re

        n = 0
        for sm in doc.get("semantic_models", []) or []:
            m = re.search(r"ref\(\s*['\"]([^'\"]+)['\"]\s*\)", str(sm.get("model", "")))
            model = m.group(1) if m else str(sm["model"])
            sem = SemanticModel(name=sm["name"], model=model)
            for d in sm.get("dimensions", []) or []:
                grain = (
                    (d.get("type_params") or {}).get("time_granularity")
                    or d.get("grain")
                    or "day"
                )
                sem.dimensions[d["name"]] = Dimension(
                    d["name"], d.get("type", "categorical"), d.get("expr"), grain
                )
            for ms in sm.get("measures", []) or []:
                sem.measures[ms["name"]] = Measure(
                    ms["name"], ms.get("agg", "sum"), ms.get("expr")
                )
            self.models[sem.name] = sem
            n += 1
        for mt in doc.get("metrics", []) or []:
            tp = mt.get("type_params") or {}
            self.metrics[mt["name"]] = Metric(
                name=mt["name"],
                type=mt.get("type", "simple"),
                measure=tp.get("measure") or mt.get("measure"),
                filter=mt.get("filter"),
                numerator=tp.get("numerator") or mt.get("numerator"),
                denominator=tp.get("denominator") or mt.get("denominator"),
                expr=tp.get("expr") or mt.get("expr"),
            )
            n += 1
        for sq in doc.get("saved_queries", []) or []:
            qp = sq.get("query_params") or {}
            wh = qp.get("where")
            if isinstance(wh, list):
                wh = " AND ".join(f"({w})" for w in wh)
            self.saved_queries[sq["name"]] = SavedQuery(
                name=sq["name"],
                metrics=list(qp.get("metrics") or []),
                group_by=list(qp.get("group_by") or []),
                where=wh,
            )
            n += 1
        return n

    def run_saved(self, name: str) -> DataFrame:
        """Execute a ``saved_queries:`` block (dbt saved queries — a named,
        reusable metric request; SP/dbt/parser/schemas.py saved_queries
        section)."""
        sq = self.saved_queries[name]
        return self.query(sq.metrics, group_by=sq.group_by, where=sq.where)

    # ------------------------------------------------------------------
    # Query compilation
    # ------------------------------------------------------------------

    def _simple_metrics_needed(self, metric: Metric, acc: set[str]) -> None:
        """Simple-metric closure of a metric. Aggregates are keyed per
        SIMPLE METRIC, not per measure: two metrics over the same measure
        with different filters (revenue vs big_revenue) must aggregate
        independently — sharing the measure column would let one metric's
        filter corrupt the other."""
        if metric.type == "simple":
            acc.add(metric.name)
        elif metric.type == "ratio":
            for ref in (metric.numerator, metric.denominator):
                self._simple_metrics_needed(self.metrics[ref], acc)
        elif metric.type == "derived":
            import re

            for name in re.findall(r"[a-zA-Z_][a-zA-Z0-9_]*", metric.expr or ""):
                if name in self.metrics:
                    self._simple_metrics_needed(self.metrics[name], acc)
        else:
            raise ValueError(f"unknown metric type {metric.type!r}")

    def _model_for(self, measure_names: set[str]) -> SemanticModel:
        owners = [
            sem
            for sem in self.models.values()
            if measure_names <= set(sem.measures)
        ]
        if not owners:
            raise ValueError(
                f"no single semantic model defines all of {sorted(measure_names)} "
                "(cross-model metric queries need a mart model joining the "
                "entities — see module docstring)"
            )
        return owners[0]

    def _metric_col(self, metric: Metric) -> F.Column:
        """Post-aggregation expression for a metric, referencing the
        ``__m_<simple-metric>`` columns produced by the groupBy."""
        if metric.type == "simple":
            return F.col(f"__m_{metric.name}")
        if metric.type == "ratio":
            num = self._metric_col(self.metrics[metric.numerator])
            den = self._metric_col(self.metrics[metric.denominator])
            return num.cast("double") / den.cast("double")
        # derived: substitute metric names with their post-agg columns.
        import re

        expr = metric.expr or ""

        def sub(m: re.Match) -> str:
            name = m.group(0)
            if name in self.metrics:
                inner = self.metrics[name]
                if inner.type == "simple":
                    return f"__m_{inner.name}"
                raise ValueError(
                    "derived metrics may reference simple metrics only"
                )
            return name

        return F.expr(re.sub(r"[a-zA-Z_][a-zA-Z0-9_]*", sub, expr))

    def query(
        self,
        metrics: list[str],
        group_by: list[str] | None = None,
        where: str | None = None,
        time_grain: str | None = None,
    ) -> DataFrame:
        """Compile and run a metric query: one Spark aggregation over the
        owning semantic model's relation. ``group_by`` names dimensions;
        a time dimension may carry an inline grain as ``dim__grain``
        (MetricFlow's ``metric_time__month`` convention), else
        ``time_grain``/its default applies."""
        mobjs = [self.metrics[m] for m in metrics]
        needed: set[str] = set()
        for m in mobjs:
            self._simple_metrics_needed(m, needed)
        sem = self._model_for(
            {self.metrics[n].measure for n in needed}
        )
        df = self.project._resolve_for_adhoc(sem.model)
        if where:
            df = df.filter(where)

        dim_cols = []
        for g in group_by or []:
            dname, _, grain = g.partition("__")
            dim = sem.dimensions.get(dname)
            if dim is None:
                raise KeyError(f"unknown dimension {dname!r} on {sem.name}")
            expr = F.expr(dim.expr or dim.name)
            if dim.type == "time":
                expr = F.date_trunc(grain or time_grain or dim.grain, expr)
                out_name = g if grain else dname
            else:
                out_name = dname
            dim_cols.append(expr.alias(out_name))

        aggs = []
        for mname in sorted(needed):
            metric = self.metrics[mname]
            ms = sem.measures[metric.measure]
            expr = F.expr(ms.expr or (ms.name if ms.agg != "count" else "1"))
            # Per-metric filters compile to conditional aggregation inside
            # the single groupBy (dbt: filters live on the metric), so a
            # filtered metric never forces a second scan.
            if metric.filter:
                expr = F.when(F.expr(metric.filter), expr)
            aggs.append(_AGGS[ms.agg](expr).alias(f"__m_{mname}"))

        grouped = (
            df.groupBy(*dim_cols).agg(*aggs)
            if dim_cols
            else df.agg(*aggs)
        )
        out_cols = [c for c in grouped.columns if not c.startswith("__m_")]
        return grouped.select(
            *out_cols,
            *[self._metric_col(m).alias(m.name) for m in mobjs],
        )
