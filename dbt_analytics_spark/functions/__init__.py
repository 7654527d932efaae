from .pg import (  # noqa: F401
    date_trunc_pg,
    extract_pg,
    ilike,
    month_end,
    norm_whitespace,
    regexp_matches_ci,
    strip_prefix_ci,
    ts_us,
)
from . import stdlib  # noqa: F401
