from .compaction import compact_table, table_file_stats  # noqa: F401
from .freshness import FreshnessResult, check_freshness  # noqa: F401
from .registry import Project, ModelContext  # noqa: F401
from .testing import (  # noqa: F401
    accepted_values,
    not_null,
    relationships,
    unique,
)
