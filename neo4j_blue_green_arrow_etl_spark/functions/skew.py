"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join split handles sort-merge skew automatically, but two
shapes still need manual salting at 100 TB:

1. a *broadcast-infeasible* hot-key join where one key holds a double-
   digit percent of the rows (AQE splits partitions, but a single key
   cannot be split across tasks for a hash aggregate), and
2. high-cardinality aggregation where one group dwarfs the rest.

Both utilities are deterministic (salt = xxhash64 of a caller-chosen
unique column, never rand()) so results are reproducible and retries
are safe — the same guarantee the engine's oracle testing relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the LEFT side's hot keys spread over
    ``n_salts`` sub-keys and the RIGHT side replicated to match.

    Use when ``right`` is too big to broadcast and ``left[key]`` is
    skewed. Each left row gets salt = xxhash64(salt_from) % n_salts
    (deterministic); each right row is exploded into all n_salts
    buckets, so every (key, salt) pair still finds its matches. Shuffle
    cost: right side grows n_salts-fold — pick n_salts ~ the factor by
    which the hottest key exceeds a healthy partition.

    ``how`` is restricted to left-preserving join types: because the
    right side is replicated n_salts-fold, 'right'/'full'/'right_outer'
    would emit n_salts duplicate rows for every UNMATCHED right row
    (matched ones join exactly once via the salt equality). To preserve
    unmatched right rows, salt the other way around.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving join types {sorted(allowed)}; "
            f"got {how!r} — the replicated right side would duplicate "
            f"unmatched right rows n_salts times"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = l_s.join(r_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (key, salt), then final aggregate on key.

    ``aggs`` maps output column -> (input column, fn) with fn one of
    sum|count|min|max (the re-aggregable functions: count re-aggregates
    as sum of partial counts). The hot group's work spreads over
    n_salts tasks in phase 1; phase 2 touches n_salts rows per key.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").cast("long").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-reaggregable function {fn!r}")
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
