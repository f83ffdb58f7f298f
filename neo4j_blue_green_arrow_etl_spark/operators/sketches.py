"""Mergeable-sketch aggregations (Apache DataSketches via Spark built-ins).

At 100 TB exact ``COUNT(DISTINCT)`` is the classic scale cliff: it
forces a full shuffle of every distinct value. The sketch pattern
replaces it with fixed-size mergeable state: each partition builds a
bounded HLL sketch (map-side), sketches merge associatively across any
re-grouping level, and the estimate is read out at the end. The same
shape serves rollup hierarchies (hour -> day -> month) because the
UNION of sketches is itself a sketch — aggregate once, re-aggregate
forever without touching the raw data again.

``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` are
Spark built-ins (JVM DataSketches, SPARK-16484 lineage); nothing here
leaves whole-stage codegen.

Oracle note: with ``lgConfigK=14`` the sketch stays in sparse
(coupon-list) mode far beyond this table's per-day cardinality
(~140 distinct users/day at sf0.01; sparse holds to thousands), and
sparse-mode estimates are EXACT, so the DuckDB oracle can compare
against exact ``COUNT(DISTINCT)``. At real scale the estimate departs
from exact (~1.6% rse at lgK=14); tests/test_extensions.py asserts the
relative-error bound at sf0.1 where cardinality is 10x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import register

HLL_LGK = 14  # 2^14 buckets: sparse-mode (exact) well past this data scale


@register(
    "q_a11_hll",
    oracle=(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "COUNT(DISTINCT user_id) AS approx_users "
        "FROM events GROUP BY 1 ORDER BY day"
    ),
    doc="Distinct users per day via two-level mergeable HLL sketches: "
    "partial sketches per (day, event_type) -> hll_union_agg to day -> "
    "estimate. The union level proves re-aggregatability: the same "
    "per-(day, type) sketch table could roll up to week/month without "
    "re-scanning raw events. Exact COUNT(DISTINCT) oracle is valid "
    "because lgK=14 keeps the sketch in sparse (exact) mode at sf<=0.1; "
    "the >=1000x-scale behavior (bounded error, fixed memory) is "
    "asserted separately in tests.",
)
def q_a11_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import _t, normalize_event_ts

    e = normalize_event_ts(_t(spark, sf_dir, "events"))
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    # Level 1: bounded sketch per (day, event_type) — map-side partials,
    # shuffle rows are fixed-size sketch blobs, never raw user ids.
    partial = e.groupBy(day, "event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk")
    )
    # Level 2: merge sketches across event types; estimate.
    return (
        partial.groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
        .orderBy("day")
    )


def distinct_sketches(df: DataFrame, value: str, *group_cols: str) -> DataFrame:
    """Reusable building block: per-group HLL sketch of ``value``.

    Returns (group_cols..., sk binary). Downstream callers union/merge
    with ``hll_union_agg`` and read with ``hll_sketch_estimate`` —
    the materialized form of 'aggregate once, re-aggregate forever'.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value, F.lit(HLL_LGK)).alias("sk")
    )
