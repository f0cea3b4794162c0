"""TPC-H suite tests: DuckDB oracle parity for all 22 queries at
sf0.001 plus physical-plan gates on the scale-critical shapes.

plans/tpch.py holds q2/q6/q8/q9/q11-q22; q1/q3/q4/q5/q7/q10 live in
plans/relational.py — the parity test covers the union so the whole
suite is value-checked in CI, not only by the driver at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from rdf_mapreduce_joins_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

TPCH = sorted(n for n in entrymod.queries() if n.startswith("tpch_q"))


def test_all_22_queries_present():
    nums = {int(n.split("_")[1][1:]) for n in TPCH}
    assert nums == set(range(1, 23))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


@pytest.mark.parametrize("name", TPCH)
def test_tpch_oracle_parity(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = sorted(tuple(_norm(r[i]) for i in order_s) for r in srows)
    oset = sorted(tuple(_norm(r[i]) for i in order_o) for r in orows)
    assert sset == oset


def _plan(df) -> str:
    """Final physical plan string (same convention as test_plans.py)."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_scan(spark):
    """Q6 is the pushdown benchmark: all three predicates must appear
    as PushedFilters on the parquet scan, the plan must be join-free,
    and the only exchange is the final single-partition agg merge."""
    df = entrymod.queries()["tpch_q6_forecast_revenue"](spark, SF_DIR)
    s = _plan(df)
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert pushed, s
    line = pushed[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in line, line
    assert s.count("Exchange") == 1, s
    assert "Join" not in s, s


def test_q2_single_window_shuffle(spark):
    """Q2's correlated-min lowers to one window over partkey: exactly
    one hashpartitioning exchange on l_partkey feeding the Window, and
    all dimension joins broadcast."""
    df = entrymod.queries()["tpch_q2_min_cost_supplier"](spark, SF_DIR)
    s = _plan(df)
    assert "Window" in s
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


def test_q18_semi_join_shape(spark):
    """Q18's IN-subquery must lower to a semi join, not an inner join
    + distinct."""
    df = entrymod.queries()["tpch_q18_large_volume"](spark, SF_DIR)
    s = _plan(df)
    assert "LeftSemi" in s, s
    assert "TakeOrderedAndProject" in s, s


def test_q21_semi_and_anti(spark):
    """Q21's EXISTS / NOT EXISTS pair must lower to one semi and one
    anti join."""
    df = entrymod.queries()["tpch_q21_waiting_supplier"](spark, SF_DIR)
    s = _plan(df)
    assert "LeftSemi" in s, s
    assert "LeftAnti" in s, s
