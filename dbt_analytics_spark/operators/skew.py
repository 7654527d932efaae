"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
explicit salting remains the tool when one join key dwarfs the rest and the
small side is too big to broadcast — e.g. a hot user_id joining an events
table at 100 TB. Salting fans each hot key across ``n_salts`` reducers:

- fact side: salt = xxhash64(row id) % n_salts  (deterministic, no RNG)
- dim side: each row replicated n_salts times (explode over 0..n_salts-1)

so join results are identical to the unsalted join while the shuffle for a
hot key spreads over n_salts partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Internal salt column name (dropped from the output).
_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salting the key so a
    skewed fact key spreads over ``n_salts`` shuffle partitions.

    The dim side is replicated ``n_salts``× — use only when dim is much
    smaller than fact (the usual skew scenario) but above the broadcast
    threshold. Results equal ``fact.join(dim, on, how)`` for inner/left
    joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # Deterministic per-row salt from the full join key plus a row-unique
    # spread component: hashing only the key would keep a hot key on one
    # reducer, so spread on all fact columns.
    salt_expr = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    f = fact.withColumn(_SALT, salt_expr)
    d = dim.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, on + [_SALT], how).drop(_SALT)
