from .readers import TABLES, load_testdata, register_testdata  # noqa: F401
from .sinks import write_jsonl_shards  # noqa: F401
from .seeds import read_seed_csv  # noqa: F401
