"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the svs_spark package: the query registry lives in
``svs_spark/query_defs.py`` (Spark builders + DuckDB oracles side by
side), and ``tests/test_oracle_parity.py`` replicates the driver's
comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact top-k dense retrieval over sf0.001 embeddings
    joined back to documents (reference svs ``KB.retrieve``,
    src/svs/kb.py:1608-1640)."""
    from svs_spark.queries import queries

    return queries()["retrieve_docs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from svs_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from svs_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
