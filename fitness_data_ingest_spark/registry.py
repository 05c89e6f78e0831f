"""Driver-facing registry: aggregates all query families into the
``queries()`` / ``oracle_sql()`` dicts consumed by ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .registry_core import CORE_QUERIES
from .registry_util import QueryDef

try:
    from .registry_ext import EXT_QUERIES
except ImportError:  # pragma: no cover - built incrementally
    EXT_QUERIES: dict[str, QueryDef] = {}

try:
    from .registry_stream import STREAM_QUERIES
except ImportError:  # pragma: no cover - built incrementally
    STREAM_QUERIES: dict[str, QueryDef] = {}

try:
    from .registry_tpch2 import TPCH2_QUERIES
except ImportError:  # pragma: no cover - built incrementally
    TPCH2_QUERIES: dict[str, QueryDef] = {}


def all_queries() -> dict[str, QueryDef]:
    out: dict[str, QueryDef] = {}
    for family in (CORE_QUERIES, EXT_QUERIES, STREAM_QUERIES, TPCH2_QUERIES):
        out.update(family)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in all_queries().items() if q.sql is not None}
