"""Z-order (Morton-curve) clustering for multi-column data skipping.

Single-column sort gives parquet row-group min/max stats that prune
scans on THAT column and destroys locality on every other; a Z-order
curve interleaves the bits of several columns so that rows close in the
multi-dimensional key space land in the same row groups — a box
predicate on ANY subset of the clustered columns then skips most row
groups via plain parquet stats pruning. This is the same physical
design exposed as ``OPTIMIZE ... ZORDER BY`` in lakehouse table formats
(public Delta/Iceberg docs); here it is a pure DataFrame transform plus
a materializer option (``zorder_by=`` in plans/materialize.py), so it
works on vanilla parquet with no table-format dependency.

Scale design: one tiny min/max aggregate (k columns, collected to the
driver — O(k) values, never data), then a fully codegen'd per-row bit
interleave, one range repartition on the z-value (the same shuffle any
global sort pays), and a within-partition sort. No UDFs, no second
pass. Linear min-max scaling is used rather than rank bucketing: it
needs no sampling pass and is exact for the uniform-ish key domains it
is meant for (ids, dates); heavily skewed columns should be bucketed or
pre-transformed first — documented, not hidden.

Reference parity: the reference engine exposes no clustering DDL; this
is one of the beyond-reference scale operators (SURVEY.md LLM-pipeline
section) justified by the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default total bits across all clustered columns; 63 is the LongType
#: sign-safe budget, 48 keeps headroom while 2^16 buckets per column (at
#: k=3) is already far below row-group granularity at any real scale.
DEFAULT_TOTAL_BITS = 48

ZVALUE_COL = "__zvalue"


#: Saturation bound for fractional-key scaling: |x * 2^20| is clamped to
#: 2^62 BEFORE the long cast. Without it, values above ~2^43 overflow the
#: cast to NULL (non-ANSI) and park at the curve origin, silently
#: destroying clustering for large-magnitude domains; clamping instead
#: saturates them at the curve edge — still monotone, which is all the
#: layout needs (results stay row-identical either way; only skipping
#: quality is at stake).
_FRAC_CLAMP = float(1 << 62)


def _to_long(col: Column, dtype: T.DataType) -> Column:
    """Monotone map of an orderable column to LongType. Fractional types
    scale by 2^20 (order preserved at bucket resolution) with the scaled
    value computed IN DOUBLE and clamped to ±2^62 before the final cast
    — magnitudes beyond ~2^42 saturate at the curve edge rather than
    overflowing to NULL."""
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # NTZ cannot cast to long directly; the tz-pinned detour is
        # monotone, which is all the curve needs (session tz is UTC)
        return col.cast("timestamp").cast("long")
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = col.cast("double") * F.lit(float(1 << 20))
        # greatest/least SKIP nulls (they don't propagate), so an
        # unguarded clamp turns NULL into -_FRAC_CLAMP — one NULL row
        # would then drag the collected min to -2^62 and collapse all
        # real values into a sliver of top buckets. Clamp only non-null
        # inputs; NULL stays NULL here, is ignored by the min/max
        # bounds aggregate, and parks at bucket 0 via the coalesce in
        # with_zvalue, as documented.
        d = F.when(
            col.isNotNull(),
            F.least(F.greatest(d, F.lit(-_FRAC_CLAMP)), F.lit(_FRAC_CLAMP)),
        )
        return d.cast("long")
    return col.cast("long")


def interleave_bits(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each column in ``scaled``.

    Bit ``b`` of column ``i`` lands at position ``b*k + i`` so no two
    inputs collide; the expression is a flat OR tree of ``bits*k``
    shift/mask terms — entirely whole-stage-codegen, no UDF.
    """
    k = len(scaled)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return z


def with_zvalue(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    total_bits: int = DEFAULT_TOTAL_BITS,
) -> DataFrame:
    """Add ``__zvalue``: the Morton code of ``cols`` under per-column
    linear min-max scaling. NULLs scale to bucket 0 (cluster together at
    the curve origin). One driver-side O(k) min/max collect, then pure
    codegen."""
    if not cols:
        raise ValueError("with_zvalue requires at least one column")
    k = len(cols)
    bits = max(1, min(total_bits // k, 63 // k))
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"zorder column {c!r} not in {sorted(dtypes)}")
    longs = {c: _to_long(F.col(c), schema[c]) for c in cols}
    bounds = df.agg(
        *[F.min(longs[c]).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(longs[c]).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    scaled = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        if mn is None or mx is None or mx == mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        span = mx - mn
        # Bucket in DOUBLE, not long: (x - mn) * top wraps for
        # near-full-range long domains (span within ~2^16 of 2^63).
        # Double loses low bits past 2^53, but the bucket resolution is
        # only `top + 1` (<= 2^16) values and double rounding is
        # monotone, so bucketing quality is unaffected.
        s = (
            (longs[c].cast("double") - F.lit(float(mn)))
            * F.lit(float(top))
            / F.lit(float(span))
        ).cast("long")
        # clamp defensively (float rounding at the top edge) and park
        # NULLs at the curve origin
        s = F.least(F.greatest(s, F.lit(0)), F.lit(top))
        scaled.append(F.coalesce(s, F.lit(0)).cast("long"))
    return df.withColumn(ZVALUE_COL, interleave_bits(scaled, bits))


def zorder_dataframe(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    n_files: int | None = None,
    total_bits: int = DEFAULT_TOTAL_BITS,
) -> DataFrame:
    """Return ``df`` globally ordered along the Z-curve of ``cols``,
    in ``n_files`` range partitions (default: session shuffle
    partitions). Writing the result as parquet yields row-group min/max
    stats that prune box predicates on any subset of ``cols``. Content
    is row-identical to the input — ordering is the only change."""
    spark = df.sparkSession
    if n_files is None:
        n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        with_zvalue(df, cols, total_bits)
        .repartitionByRange(n_files, F.col(ZVALUE_COL))
        .sortWithinPartitions(ZVALUE_COL)
        .drop(ZVALUE_COL)
    )
