"""Mirror of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql on DuckDB over the same parquet (sf0.001 locally;
the driver uses sf0.01), compare row count, column names, and
order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as contract

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb(spark, duck, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    want = _canon(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-9, rtol=1e-9)


def test_weak_check_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = contract.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "span_idx", "cluster_id"}


def test_every_query_has_an_oracle():
    """r4: the no-oracle set is EMPTY — every queries() entry ships DuckDB
    oracle SQL (media_features' stub algebra closed the last gap).  A new
    query without an oracle should be a conscious, reviewed decision."""
    assert set(QUERIES) == set(ORACLES), (
        sorted(set(QUERIES) - set(ORACLES)),
        sorted(set(ORACLES) - set(QUERIES)),
    )
