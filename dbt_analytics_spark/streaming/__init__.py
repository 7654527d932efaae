from .incremental import (  # noqa: F401
    dedup_stream,
    enrich_stream,
    microbatch_append,
    stream_stream_interval_join,
    sessionized_counts_stateful,
    stream_dedup_ingest,
    stream_from_parquet_dir,
    stream_ivf_ingest,
    watermarked_window_agg,
)
