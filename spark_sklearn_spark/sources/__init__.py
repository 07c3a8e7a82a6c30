from .io import TABLES, load, register_views, write_parquet  # noqa: F401
