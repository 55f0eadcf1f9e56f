"""Central query registry — the correctness contract with the driver.

Every SURVEY.md §2 operator key registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
DuckDB-runnable ANSI-SQL oracle string. ``__spark_entry__.py`` exposes
these verbatim as ``queries()`` / ``oracle_sql()``.

Conventions (driver compare = row count + schema + order-insensitive
value hash with columns sorted by name):

- every computed column is aliased IDENTICALLY in the DataFrame code
  and the oracle SQL;
- double aggregates are rounded (4–6 dp) on BOTH sides — Spark and
  DuckDB sum floats in different orders;
- DuckDB integer SUM returns HUGEINT and many scalar fns return BIGINT
  where Spark returns INT — oracles CAST to the Spark-side type;
- timestamps in outputs are surfaced as epoch-second BIGINTs or DATEs,
  never raw timestamps (pandas ns-vs-µs unit mismatch hazards).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None => driver runs rows-only check
    tags: tuple = field(default_factory=tuple)


_SPECS: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in _SPECS:
            raise ValueError(f"duplicate query key {name!r}")
        _SPECS[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _load_all() -> None:
    # Import side effects populate _SPECS; keep sorted by build phase.
    from . import kmeans_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import eventtime  # noqa: F401
    from . import llm  # noqa: F401


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_SPECS)


def QUERIES() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: s.fn for name, s in specs().items()}


def ORACLES() -> dict[str, str]:
    return {name: s.oracle for name, s in specs().items() if s.oracle is not None}


def query_names() -> list[str]:
    return sorted(specs())
