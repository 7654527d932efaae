from .flatten import explode_csv_cell  # noqa: F401
from .spine import date_spine  # noqa: F401
from .top1 import top1_per_group, lateral_top1_join  # noqa: F401
from .asof import asof_join  # noqa: F401
from .rangejoin import interval_join  # noqa: F401
