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


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    The driver process may import this package from an arbitrary CWD via
    sys.path manipulation — which executor Python workers do NOT
    inherit, so any query that pickles package-defined callables or
    classes (the Python DataSource, mapInPandas helpers) would fail
    with ModuleNotFoundError on the workers. A zip of the package added
    once per SparkContext makes the import resolve everywhere.
    """
    sc = spark.sparkContext
    if getattr(sc, "_sse_pkg_shipped", False):
        return
    sc.addPyFile(_package_zip())
    sc._sse_pkg_shipped = True


_PKG_ZIP: str | None = None


def _package_zip() -> str:
    """Build (once per process) a zip snapshot of this package.

    The snapshot is taken at FIRST use per process and reused for every
    SparkContext in that process; code edits after that are not
    reflected on executors until a new Python process starts. The temp
    file is removed at interpreter exit instead of accumulating in
    /tmp.
    """
    global _PKG_ZIP
    if _PKG_ZIP is not None:
        return _PKG_ZIP
    import atexit
    import contextlib
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, zip_path = tempfile.mkstemp(prefix="sse_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    arc = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, arc)

    def _cleanup(path: str = zip_path) -> None:
        with contextlib.suppress(OSError):
            os.unlink(path)

    atexit.register(_cleanup)
    _PKG_ZIP = zip_path
    return zip_path


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip())
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
