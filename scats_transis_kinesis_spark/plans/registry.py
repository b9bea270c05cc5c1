"""The query registry — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 (and every extension
operator) registers here as a named query: a ``(spark, sf_dir) ->
DataFrame`` callable plus, where SQL-expressible, the equivalent DuckDB
oracle SQL.  ``__spark_entry__.py`` re-exports this registry.

Conventions that keep the oracle compare exact:

- Column names are aliased identically in the Spark plan and the SQL.
- Floating aggregates are ``round``-ed (the data carries 2-decimal
  values; rounding to 4 removes partial-aggregation FP noise without
  touching real information).
- Ordered/top-k queries always carry a deterministic key tiebreaker.
- Session timezone is UTC, matching DuckDB's UTC-naive timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


# Importing the query modules populates REGISTRY (kept at the bottom so
# the decorators see the helpers above).
from . import core_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import relational_queries2  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import parity_queries  # noqa: E402,F401
from . import extension_queries  # noqa: E402,F401
from . import extension_queries2  # noqa: E402,F401
from . import coverage_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
