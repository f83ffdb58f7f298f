"""Vectorized Python surface: pandas UDAF (Series→scalar) and
applyInPandas (grouped map) — SURVEY §2.10's declared UDAF/UDTF rows.

The reference's only UDF surface is a per-RecordBatch mapping callback
(neo4j_arrow_client.py:152-206) and a pandas row-apply it uses for label
splitting (neo4j_pq.py:59). This module is the engine's Arrow-batched
generalization of that hook: grouped aggregation and grouped
transformation written in pandas, shipped per Arrow batch (never
row-at-a-time). Use ONLY where built-in expressions can't express the
semantics — both queries here have exact SQL oracles precisely so the
vectorized-Python path is provably correct against the JVM path.

Scale: both are one hash-shuffle on the group key. applyInPandas
materializes each group in executor memory — groups here are per-key
bounded (orders per customer); for unbounded groups prefer window
functions or applyInPandasWithState.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .relational import register


def _make_wavg():
    """Build the UDAF inside a function for two reasons: (a) DoubleType()
    instead of the DDL string "double" — string return types parse via
    the active SparkContext, which doesn't exist at registry-import time;
    (b) the inner function is a closure, which cloudpickle ships BY VALUE
    to executors — a module-level function is pickled by reference and
    would require this package on every worker's sys.path."""

    @pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # quantity-weighted mean price over one group (Arrow-batched)
        denom = qty.sum()
        return float((price * qty).sum() / denom) if denom else 0.0

    return wavg


@register(
    "q_udaf_wavg",
    oracle=(
        "SELECT l_returnflag, "
        "ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS wavg_price "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    doc="Pandas UDAF (Series→scalar grouped agg): quantity-weighted "
    "average price per return flag. Arrow-batched transfer, map-side "
    "partials do NOT apply to pandas UDAFs — acceptable here because "
    "groups are few; the SQL-expressible form (the oracle) is what "
    "production would run, this pins the UDAF machinery itself.",
)
def q_udaf_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wavg = _make_wavg()
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "q_udf_zscore",
    oracle=(
        "SELECT o_orderkey, "
        "ROUND(CASE WHEN stddev_pop(o_totalprice) OVER w = 0 THEN 0.0 "
        "ELSE (o_totalprice - AVG(o_totalprice) OVER w) / (stddev_pop(o_totalprice) OVER w) "
        "END, 4) AS z FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey) ORDER BY o_orderkey"
    ),
    doc="applyInPandas grouped-map: z-score normalization of order "
    "totals within each customer — the shape every feature-normalization "
    "step in a training-data pipeline takes. One shuffle on o_custkey; "
    "each group materializes in pandas (bounded: orders-per-customer).",
)
def q_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-customer z-score (population stddev; 0.0 for degenerate
        # single-order / zero-variance groups); closure → shipped by value
        m = pdf["o_totalprice"].mean()
        s = pdf["o_totalprice"].std(ddof=0)
        z = (pdf["o_totalprice"] - m) / s if s else pdf["o_totalprice"] * 0.0
        return pd.DataFrame({"o_orderkey": pdf["o_orderkey"], "z": z.round(4)})

    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(zscore, "o_orderkey long, z double")
        .orderBy("o_orderkey")
    )
