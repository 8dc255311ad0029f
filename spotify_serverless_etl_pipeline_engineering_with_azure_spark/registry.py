"""Query registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 is registered here as a
named query: a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent DuckDB oracle SQL. The driver runs both
at sf0.01 and compares row count + schema + order-insensitive value
hash, so every computed column is aliased identically on both sides and
floating-point aggregates use the exact-decimal discipline in
``functions/exact.py``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "plans.analytics",
    "plans.reference_ops",
    "plans.text_ops",
    "plans.dedup",
    "plans.similarity",
    "plans.streaming_queries",
    "plans.udfs",
    "plans.misc_ops",
    "plans.extended_ops",
    "plans.tpch_suite",
    "plans.advanced_ops",
    "plans.etl_ops",
    "plans.scale_ops",
    "operators.spotify_queries",
    "multimodal.media",
)

_loaded = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, Query]:
    global _loaded
    if not _loaded:
        pkg = __name__.rsplit(".", 1)[0]
        for mod in _QUERY_MODULES:
            importlib.import_module(f"{pkg}.{mod}")
        _loaded = True
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
