"""``python -m dbt_analytics_spark`` — the CLI entry point (reference:
dbt's console script, SP/dbt/cli/main.py:155-164)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
