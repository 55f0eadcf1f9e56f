from .registry import QUERIES, ORACLES, query_names  # noqa: F401
