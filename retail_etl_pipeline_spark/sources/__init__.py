"""Custom source connectors (Python DataSource API, Spark 4)."""

from .synthetic import SyntheticEventsDataSource, register_synthetic_source

__all__ = ["SyntheticEventsDataSource", "register_synthetic_source"]
