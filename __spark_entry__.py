"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship ER pipeline (blocking + pairwise scoring +
                 connected-components clustering) over sf0.001.
``queries``    — one entry per implemented operator from SURVEY.md §2 and
                 the training-data-pipeline ops (dedup, similarity search,
                 text analysis), each a (spark, sf_dir) -> DataFrame.
``oracle_sql`` — DuckDB-equivalent ANSI SQL per query (omitted only for
                 genuinely non-SQL-expressible ops, e.g. iterative CC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wdel_spark.entry_pipeline import entry_flagship

    return entry_flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wdel_spark.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from wdel_spark.queries import REGISTRY

    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
