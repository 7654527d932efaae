"""dbt_analytics_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
(goatmark/dbt-analytics: a dbt-core + PostgreSQL pipeline project) as an
idiomatic Spark engine:

- ``plans``      — model registry, ref() resolution, DAG scheduling,
                   materializations (dbt's engine layer re-imagined on Spark).
- ``sources``    — parquet / CSV-seed readers and catalog registration.
- ``functions``  — PostgreSQL-compatibility column helpers (ilike, regex,
                   date_trunc grains, intervals) built on pyspark.sql.functions.
- ``operators``  — reusable relational + data-pipeline operators: lateral
                   top-1 rewrite, date spine, explode-flatten, dedup family
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                   similarity search, text analysis, sessionization,
                   multimodal column plumbing.
- ``streaming``  — Structured Streaming variants (microbatch incremental).
- ``workload``   — the reference's 27-model finance/health workload
                   re-expressed Spark-first on this engine.

Everything is DataFrame-first: logical plans are declared via the DataFrame /
Spark SQL API and Catalyst picks the physical strategy. Python UDFs are used
only where built-ins cannot express the semantics, and then always as
Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
