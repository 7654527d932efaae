"""PostgreSQL-compatibility column helpers.

The reference workload is PostgreSQL-dialect SQL (SURVEY.md §2a); these
helpers express the PG constructs the models rely on as native Spark Column
expressions (JVM-side, codegen-friendly — no Python UDFs).

Each helper cites the reference construct it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ilike(col: Column | str, pattern: str) -> Column:
    """PG ``ILIKE`` — case-insensitive LIKE.

    Reference usage: ~570 occurrences, e.g. models/card_merchants_model.sql:7-617,
    models/card_transactions_model.sql:9-13.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.ilike(pattern)


def regexp_matches_ci(col: Column | str, pattern: Column | str) -> Column:
    """PG ``~*`` — case-insensitive POSIX regex match.

    Reference usage: models/classified_card_transactions.sql:85-87,139-144
    (``desc ~* r.pattern_regex`` against seeds/merchant_regex.csv patterns).
    Java regex accepts this corpus's constructs (``\\s \\d \\b .? .* ^ $``);
    the ``(?i)`` prefix supplies PG's case-insensitivity.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(pattern) if isinstance(pattern, str) else pattern
    return c.rlike(F.concat(F.lit("(?i)"), p))


#: PG-only regex escapes → Java equivalents. PG's ARE dialect has word
#: boundary escapes Java/RE2 lack: ``\y`` (boundary), ``\Y`` (non-boundary),
#: ``\m`` (word start), ``\M`` (word end). The workload's merchant_regex
#: seed uses ``\y`` in 428/795 patterns (seeds/merchant_regex.csv).
_PG_ESCAPES = [
    (r"\y", r"\b"),
    (r"\Y", r"\B"),
    (r"\m", r"\b(?=\w)"),
    (r"\M", r"\b(?<=\w)"),
]


def pg_regex_to_java(pattern: str) -> str:
    """Translate a PostgreSQL regex to the Java dialect (for ``rlike``).

    Reference usage site: ``desc ~* r.pattern_regex``
    (models/classified_card_transactions.sql:139-144)."""
    out = []
    i = 0
    while i < len(pattern):
        if pattern[i] == "\\" and i + 1 < len(pattern):
            tok = pattern[i : i + 2]
            for pg, java in _PG_ESCAPES:
                if tok == pg:
                    out.append(java)
                    break
            else:
                out.append(tok)
            i += 2
        else:
            out.append(pattern[i])
            i += 1
    return "".join(out)


def pg_regex_to_java_col(col: Column | str) -> Column:
    """Column-level PG→Java regex translation (for data-driven pattern
    tables, e.g. the merchant_regex seed)."""
    c = F.col(col) if isinstance(col, str) else col
    # \y ↔ \b swap; \Y ↔ \B. A literal backslash-escaped backslash before
    # y/Y does not occur in this corpus (audited in tests/test_functions.py).
    c = F.regexp_replace(c, r"\\y", r"\\b")
    c = F.regexp_replace(c, r"\\Y", r"\\B")
    return c


def norm_whitespace(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim.

    Reference: models/classified_card_transactions.sql:39-46
    (``regexp_replace(d, '\\s+', ' ', 'g')`` — Spark's regexp_replace is
    global by default, matching PG's ``g`` flag).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_prefix_ci(col: Column | str, prefix_pattern: str) -> Column:
    """Strip a ``^``-anchored prefix, case-insensitively.

    Reference: models/classified_card_transactions.sql:60-66 (aggregator
    prefix strip with the ``i`` flag). Because the pattern is ^-anchored, a
    global replace is equivalent to PG's single-occurrence form.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "(?i)" + prefix_pattern, "")


def date_trunc_pg(grain: str, col: Column | str) -> Column:
    """PG ``date_trunc(grain, x)`` returning a DATE (the workload always
    consumes the truncated value at date precision).

    Reference: models/spend_daily.sql:2, models/metrics_monthly.sql:14.
    Spark's and PG's ``week`` are both ISO Monday-start
    (verified in tests/test_functions.py over year boundaries).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc(grain, c).cast("date")


def extract_pg(field: str, col: Column | str) -> Column:
    """PG ``extract(field from x)::int``.

    Reference: models/metrics_monthly.sql:7 (month), metrics_weekly.sql:7
    (week — ISO week number; Spark ``weekofyear`` matches PG).
    """
    c = F.col(col) if isinstance(col, str) else col
    fns = {
        "year": F.year,
        "quarter": F.quarter,
        "month": F.month,
        "week": F.weekofyear,
        "day": F.dayofmonth,
        # PG dow is 0-6 with Sunday=0; Spark dayofweek is 1-7 with Sunday=1.
        "dow": lambda x: F.dayofweek(x) - 1,
        "doy": F.dayofyear,
    }
    return fns[field](c).cast("int")


def month_end(col: Column | str) -> Column:
    """PG ``d + interval '1 month - 1 day'`` on a month-start date.

    Reference: models/metrics_monthly.sql:6. Expressed as ``last_day`` which
    Catalyst folds to a single JVM intrinsic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.last_day(c)


def ts_us(col: Column | str) -> Column:
    """Microseconds since the epoch from any temporal column.

    ``F.unix_micros`` requires TIMESTAMP and rejects TIMESTAMP_NTZ/DATE —
    parquet written with ``isAdjustedToUTC=false`` surfaces as NTZ, which
    broke event-time queries when the testdata generator switched formats.
    The session timezone is pinned UTC, so casting first yields identical
    instants for every input type. Stays a Catalyst expression (codegen'd).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
