"""Sources — custom Spark data sources for the change feed (SURVEY.md §2.1)."""

from .wal_source import WalTailDataSource, register_wal_source  # noqa: F401
