from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark import WAREHOUSE_TABLES
from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

from conftest import SF_ORACLE, SF_SMOKE

# Queries spot-checked in unit tests (full set runs in
# tools/check_correctness.py and the driver's gate).
SPOT = ["q_a1", "q_j1", "q_p1", "q_w1", "q_st1", "q_u2", "q_x2"]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in WAREHOUSE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con


def _canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    return sorted("|".join(render(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", SPOT)
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_SMOKE)
    res = oracle.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(ocols)
    assert _canon(srows, sdf.columns) == _canon(orows, ocols)


def test_every_registered_query_has_doc():
    for name, spec in REGISTRY.items():
        assert spec.doc, f"{name} missing doc"


def test_approx_count_distinct_within_5pct(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_suppkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_suppkey")).first()[0]
    assert abs(approx - exact) / exact <= 0.05


def test_filter_pushdown_reaches_scan(spark):
    """The q_p4 predicates must appear as PushedFilters in the parquet
    scan — scale guarantee: the filter runs in the reader, not after."""
    plan = REGISTRY["q_p4"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1][:300]


def test_broadcast_join_strategy(spark):
    """q_j2 must plan a broadcast hash join (dim side broadcast)."""
    plan = REGISTRY["q_j2"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topk_avoids_global_sort(spark):
    """q_t1 must use TakeOrderedAndProject, not a full Sort+Limit."""
    plan = REGISTRY["q_t1"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_range_join_not_cartesian(spark):
    """q_j6 anchors on the c_nationkey equi-key: the plan must be a hash
    or sort-merge join with residual condition, never cartesian."""
    plan = REGISTRY["q_j6"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan


def test_stratified_sampling_deterministic(spark):
    """Training-pipeline sampling surface: sampleBy (per-stratum
    fractions) is seed-deterministic and lands near the requested
    fractions; systematic doc_id sampling is exactly reproducible."""
    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    fractions = {"en": 0.5, "de": 0.2}
    s1 = d.sampleBy("lang", fractions, seed=42)
    s2 = d.sampleBy("lang", fractions, seed=42)
    assert s1.count() == s2.count()  # same seed -> same sample
    assert s1.exceptAll(s2).isEmpty()
    per = {r.lang: r.cnt for r in s1.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    base = {r.lang: r.cnt for r in d.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(per) <= {"en", "de"}  # unlisted strata excluded entirely
    for lang, frac in fractions.items():
        got = per.get(lang, 0) / base[lang]
        assert abs(got - frac) < 0.15, (lang, got)


def test_approx_percentile_tracks_exact(spark):
    """The production swap q_a7_percentile's doc promises: t-digest
    approx_percentile (mergeable partial state, no per-group sort) must
    track the exact interpolated percentile within 1%."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    both = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("approx"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) / r.exact < 0.01, r


def test_nullsafe_join_keeps_null_group_plain_join_drops_it(spark):
    """The semantic pin for q_j14_nullsafe: the NULL key group appears
    with eqNullSafe and disappears under a plain equi-join."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    out = REGISTRY["q_j14_nullsafe"].spark(spark, SF_SMOKE).collect()
    null_rows = [r for r in out if r.nk is None]
    assert len(null_rows) == 1 and null_rows[0].n > 0
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        F.nullif(
            F.get_json_object("props", "$.k").cast("int") % 7, F.lit(0)
        ).alias("nk")
    )
    d = e.distinct().withColumnRenamed("nk", "dk")
    plain = d.join(e, d.dk == e.nk).groupBy("dk").count().collect()
    assert all(r.dk is not None for r in plain)
    # totals reconcile: null-safe join covers every event row
    assert sum(r.n for r in out) == e.count()


def test_mad_matches_numpy(spark):
    """Median/MAD against numpy on the same grouped data."""
    import numpy as np

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    out = {r.c_nationkey: (r.med, r.mad) for r in REGISTRY["q_a14_mad"].spark(spark, SF_SMOKE).collect()}
    pdf = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_nationkey", "c_acctbal")
        .toPandas()
    )
    for nk, grp in pdf.groupby("c_nationkey"):
        med = np.percentile(grp["c_acctbal"], 50, method="linear")
        mad = np.percentile(np.abs(grp["c_acctbal"] - med), 50, method="linear")
        got = out[nk]
        assert abs(got[0] - round(med, 4)) < 1e-9, nk
        assert abs(got[1] - round(mad, 4)) < 1e-9, nk


def test_expectations_cap_rule_fires_and_clean_rules_are_zero(spark):
    """The suite must prove both paths: the value-cap rule fires on
    this data; the integrity rules (PK/FK/range/enum) report zero."""
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    out = {r.rule: r.violations for r in REGISTRY["q_dq1_expectations"].spark(spark, SF_SMOKE).collect()}
    assert out["events_value_le_cap"] > 0
    for rule in (
        "orders_pk_unique",
        "orders_fk_customer",
        "orders_price_positive",
        "orders_status_enum",
    ):
        assert out[rule] == 0, rule
