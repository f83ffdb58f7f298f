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
from pyspark.sql import DataFrame, SparkSession, Window
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
    "production would run, this pins the UDAF machinery itself. "
    "Input is pre-projected to the three referenced columns BEFORE the "
    "aggregate: Catalyst does not prune the scan through a pandas "
    "GROUPED_AGG, so without this the full 16-column lineitem rows are "
    "read and shuffled (measured ~4x slower at sf0.1).",
)
def q_udaf_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    wavg = _make_wavg()
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "q_udf_zscore",
    oracle=(
        # the trailing + 0.0 collapses IEEE -0.0 (a tiny negative z
        # rounded to 4 places) to +0.0 — the engines otherwise disagree
        # on the zero's sign at sf0.1
        "SELECT o_orderkey, "
        "ROUND(CASE WHEN stddev_pop(o_totalprice) OVER w = 0 THEN 0.0 "
        "ELSE (o_totalprice - AVG(o_totalprice) OVER w) / (stddev_pop(o_totalprice) OVER w) "
        "END, 4) + 0.0 AS z FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey) ORDER BY o_orderkey"
    ),
    doc="Per-customer z-score normalization — implemented NATIVELY with "
    "window aggregates. This was first built as applyInPandas and was "
    "34x slower at sf0.1: the key space is many TINY groups (10 orders "
    "per customer) and grouped-map pays per-group Python invocation "
    "overhead. Engine rule of thumb encoded here: grouped-map Python is "
    "for few-large-groups (see q_udf_qnorm); many-small-groups stays in "
    "JVM window aggregation (one shuffle, whole-stage codegen).",
)
def q_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey")
    s = F.stddev_pop("o_totalprice").over(w)
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / s
    return o.select(
        "o_orderkey",
        # + 0.0 normalizes -0.0 (see oracle comment)
        (F.round(F.when(s == 0, 0.0).otherwise(z), 4) + F.lit(0.0)).alias("z"),
    ).orderBy("o_orderkey")


@register(
    "q_udf_qnorm",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "ROUND(PERCENT_RANK() OVER (PARTITION BY l_returnflag "
        "ORDER BY l_extendedprice), 6) AS pr "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    doc="applyInPandas grouped-map in its CORRECT shape — few large "
    "groups (3 return flags x ~200k rows at sf0.1): per-group quantile "
    "rank (percent_rank) computed in pandas. One shuffle on the group "
    "key, 3 Python invocations total, Arrow-batched both ways. The "
    "window-function oracle pins exact tie semantics (min-rank).",
)
def q_udf_qnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def qnorm(pdf: pd.DataFrame) -> pd.DataFrame:
        # percent_rank = (min_rank - 1) / (n - 1); self-contained closure
        n = len(pdf)
        r = pdf["l_extendedprice"].rank(method="min")
        pr = (r - 1.0) / (n - 1.0) if n > 1 else r * 0.0
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "pr": pr.round(6),
            }
        )

    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(qnorm, "l_orderkey long, l_linenumber long, pr double")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_udtf_tokens",
    oracle=(
        "SELECT doc_id, "
        "unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS token, "
        "unnest(range(1, len(list_filter(string_split(text, ' '), t -> length(t) > 0)) + 1)) AS pos "
        "FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos"
    ),
    doc="Python UDTF (§2.10 declared): table function emitting one "
    "(token, pos) row per token of each input document — the "
    "generator/flatMap surface as a first-class SQL-callable function. "
    "Restricted to 50 docs: UDTFs run row-at-a-time Python (the slow "
    "path by design — the audit exempts q_udtf_* as the declared UDTF "
    "demo); production tokenization is q_text_* column expressions.",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # class defined inside the builder: shipped by value, no executor
    # import coupling (same rule as the pandas closures above)
    @udtf(returnType="token: string, pos: bigint")
    class Tokenize:
        def eval(self, text: str):
            pos = 0
            for tok in (text or "").split(" "):
                if tok:
                    pos += 1
                    yield tok, pos

    import uuid

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    # unique names per invocation: no collision if two sessions/threads
    # run the registry concurrently
    view = f"_udtf_docs_{uuid.uuid4().hex[:8]}"
    fn = f"tokenize_udtf_{uuid.uuid4().hex[:8]}"
    d.createOrReplaceTempView(view)
    spark.udtf.register(fn, Tokenize)
    return spark.sql(
        f"SELECT d.doc_id, t.token, t.pos "
        f"FROM {view} d, LATERAL {fn}(d.text) t "
        f"ORDER BY d.doc_id, t.pos"
    )
