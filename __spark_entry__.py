"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship traversal on sf0.001 (smoke check).
queries()     — one entry per implemented operator from SURVEY.md §2,
                each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalent per query.

Implementations live in nebula_storage_spark/workload.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nebula_storage_spark.workload import build_oracles, build_queries
from nebula_storage_spark.graph import tpch_graph
from nebula_storage_spark.operators import get_neighbors


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: GetNeighbors traversal (customer -> placed orders) with
    vertex + edge props and a filter, on sf0.001."""
    g = tpch_graph(spark, "/root/testdata/sf0.001")
    return get_neighbors(
        g, list(range(100)), "placed",
        vertex_tag="customer", vertex_props=["c_name", "c_mktsegment"],
        edge_props=["o_totalprice", "o_orderstatus"],
        edge_filter="o_totalprice > 1000")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
