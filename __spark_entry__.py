"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship windowed-traffic rollup at sf0.001;
``queries``/``oracle_sql`` re-export the engine's query registry
(scats_transis_kinesis_spark/plans/registry.py) — one entry per
implemented operator from SURVEY.md §2 plus the north-star extension
operators, each paired with its DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_engine_conf(spark: SparkSession) -> None:
    """Apply the engine's session-level settings to a driver-provided
    session (the driver builds its own SparkSession, so the settings in
    session.py must also be applied here)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; loaders handle both layouts
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_engine_conf(spark)
    from scats_transis_kinesis_spark.plans.registry import REGISTRY

    return REGISTRY["flagship_window_traffic"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from scats_transis_kinesis_spark.plans.registry import queries as _queries

    wrapped = {}
    for name, fn in _queries().items():
        def make(f):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ensure_engine_conf(spark)
                return f(spark, sf_dir)

            return run

        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    from scats_transis_kinesis_spark.plans.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
