"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial-contains query end-to-end on sf0.001;
``queries``/``oracle_sql`` expose the full operator set from SURVEY.md §2
plus the training-data pipeline operators (dedup / ANN / text), with DuckDB
oracles for every SQL-expressible entry (see rgm/benchqueries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prep(spark: SparkSession) -> None:
    """Ship the rgm package zip to Python workers (--py-files stand-in)."""
    from rgm.session import package_zip

    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the spatial index
    over order-derived image points, run the 8-cap Contains batch with
    exact refinement."""
    _prep(spark)
    from rgm import benchqueries as bq

    return bq.q_spatial_contains_cap(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rgm import benchqueries as bq

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in bq.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from rgm import benchqueries as bq

    return dict(bq.ORACLES)
