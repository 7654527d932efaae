from .incremental import (  # noqa: F401
    microbatch_append,
    sessionized_counts_stateful,
    stream_from_parquet_dir,
    watermarked_window_agg,
)
