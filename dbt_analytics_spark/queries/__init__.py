"""Query catalog: every implemented operator as a named (spark_builder,
oracle_sql) pair over the driver testdata tables.

The names map to SURVEY.md §2 operator IDs (and the LLM-data-pipeline
extension set). ``REGISTRY[name] = (builder, oracle_sql_or_None)``:
``builder(spark, sf_dir) -> DataFrame``; ``oracle_sql`` is equivalent ANSI
SQL for the DuckDB correctness oracle (None → rows-only check for
non-SQL-expressible ops).
"""

from __future__ import annotations

from . import core, llm

REGISTRY: dict = {}
REGISTRY.update(core.REGISTRY)
REGISTRY.update(llm.REGISTRY)


def queries():
    return {name: builder for name, (builder, _) in REGISTRY.items()}


def oracle_sql():
    return {
        name: sql for name, (_, sql) in REGISTRY.items() if sql is not None
    }
