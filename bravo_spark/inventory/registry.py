"""Registry the driver contract (__spark_entry__.py) is assembled from."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from bravo_spark import catalog, llmops
from bravo_spark.session import tune

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query; ``oracle`` is equivalent DuckDB SQL over the
    pre-registered table views (omit only for non-SQL-expressible ops)."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            catalog.register_views(spark, sf_dir)
            # caches from the PREVIOUS query have served their evaluation;
            # drain them so repeated queries never accrete executor memory
            llmops.release_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
