"""Semantic invariants of the TPC-H-shape suite (operators/tpch.py).

The oracle sweep already pins value equality vs DuckDB at two SFs;
these tests pin PROPERTIES that hash equality alone would not explain
to a reader — outer-join row preservation, ratio bounds, threshold
consistency, and the Q21 exists/not-exists rewrite — on the smoke
fixture, fast enough for every run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

from conftest import SF_SMOKE


def _run(spark, name):
    return REGISTRY[name].spark(spark, SF_SMOKE)


def test_q13_histogram_preserves_every_customer(spark):
    """Q13's LEFT join must keep zero-order customers: the histogram's
    total mass equals the customer count exactly."""
    hist = _run(spark, "q_h13_custdist")
    total = hist.agg(F.sum("custdist")).collect()[0][0]
    n_cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").count()
    assert total == n_cust


def test_q8_share_is_a_proper_fraction(spark):
    rows = _run(spark, "q_h8_share").collect()
    assert rows, "date window must not be empty at the smoke SF"
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0


def test_q11_values_exceed_the_global_threshold(spark):
    from neo4j_blue_green_arrow_etl_spark.operators.tpch import _Q11_FRACTION

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_quantity") * F.col("l_extendedprice") / (1 + F.col("l_tax"))
        ).alias("value")
    )
    thresh = pv.agg(F.sum("value")).collect()[0][0] * _Q11_FRACTION
    got = _run(spark, "q_h11_partvalue").collect()
    assert got
    for r in got:
        assert r.value > thresh - 0.01  # output is rounded to cents


def test_q15_keeps_ties_and_matches_scalar_max(spark):
    from neo4j_blue_green_arrow_etl_spark.operators.tpch import (
        _Q15_HI,
        _Q15_LO,
    )

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= _Q15_LO) & (F.col("l_shipdate") < _Q15_HI)
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
    )
    mx = rev.agg(F.max("r")).collect()[0][0]
    got = _run(spark, "q_h15_topsupp").collect()
    winners = {r.l_suppkey for r in rev.collect() if abs(r.r - mx) < 1e-9}
    assert {r.s_suppkey for r in got} == winners


def test_q18_orders_really_exceed_the_quantity_threshold(spark):
    from neo4j_blue_green_arrow_etl_spark.operators.tpch import _Q18_QTY

    got = _run(spark, "q_h18_bigorders").collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    qty = {
        r.l_orderkey: r.q
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    for r in got:
        assert qty[r.o_orderkey] > _Q18_QTY
        assert r.total_qty == qty[r.o_orderkey]


def test_q21_rewrite_matches_naive_exists_semantics(spark):
    """The per-order aggregate rewrite must equal the literal
    double-correlated EXISTS / NOT EXISTS evaluated the naive way
    (driver-side over the smoke fixture)."""
    from neo4j_blue_green_arrow_etl_spark.operators.tpch import (
        _Q21_LATE_DAYS,
        _Q21_NATION,
    )

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    ss = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(F.datediff("l_shipdate", "o_orderdate")).alias("lag")
        )
        .collect()
    )
    by_order: dict[int, list] = {}
    for r in ss:
        by_order.setdefault(r.l_orderkey, []).append(r)
    s = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
    n = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").filter(
        F.col("n_name") == _Q21_NATION
    )
    nation_supp = {
        r.s_suppkey: r.s_name
        for r in s.join(n, s.s_nationkey == n.n_nationkey).collect()
    }
    waits: dict[str, int] = {}
    for rows in by_order.values():
        late = [r for r in rows if r.lag > _Q21_LATE_DAYS]
        # EXISTS co-supplier and NOT EXISTS other late supplier
        if len(rows) >= 2 and len(late) == 1 and late[0].l_suppkey in nation_supp:
            name = nation_supp[late[0].l_suppkey]
            waits[name] = waits.get(name, 0) + 1
    want = sorted(waits.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.s_name, r.numwait) for r in _run(spark, "q_h21_waiting").collect()]
    assert got == want


def test_q6_predicates_reach_the_scan(spark):
    """Q6's whole point is pushdown: all three predicates must appear in
    the parquet scan's PushedFilters, and the plan must contain no
    Exchange other than the single partial-agg gather."""
    plan = (
        _run(spark, "q_h6_forecast")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_matches_a_driver_side_recomputation(spark):
    from neo4j_blue_green_arrow_etl_spark.operators.tpch import (
        _Q6_DISC_HI,
        _Q6_DISC_LO,
        _Q6_HI,
        _Q6_LO,
        _Q6_QTY,
    )

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
        .collect()
    )
    import datetime

    lo = datetime.datetime.fromisoformat(_Q6_LO)
    hi = datetime.datetime.fromisoformat(_Q6_HI)
    want = round(
        sum(
            r.l_extendedprice * r.l_discount
            for r in rows
            if lo <= r.l_shipdate < hi
            and _Q6_DISC_LO <= r.l_discount <= _Q6_DISC_HI
            and r.l_quantity < _Q6_QTY
        ),
        2,
    )
    got = _run(spark, "q_h6_forecast").collect()[0].revenue
    assert abs(got - want) < 0.02
