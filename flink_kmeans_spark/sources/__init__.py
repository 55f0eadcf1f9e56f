from .tables import TABLES, load_table, register_views, spread_scan  # noqa: F401
