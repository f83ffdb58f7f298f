"""Temporal + vectorized-Python operator behavior (the oracle gate covers
value parity; these pin the semantics the oracle can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

from conftest import SF_SMOKE


def test_asof_only_prior_errors(spark):
    """Every click's matched error must exist at-or-before the click for
    the same user — checked by reconstructing the candidate set."""
    res = REGISTRY["q_j7_asof"].spark(spark, SF_SMOKE)
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.round("value", 2).alias("value")
    )
    joined = res.join(clicks, ["event_id", "user_id"])
    # matched values must appear among that user's prior errors
    bad = (
        joined.filter(F.col("last_error_value").isNotNull())
        .join(errors, ["user_id"])
        .filter(F.col("err_ts") <= F.col("click_ts"))
        .groupBy("event_id", "last_error_value")
        .agg(F.collect_set("value").alias("candidates"))
        .filter(~F.array_contains("candidates", F.col("last_error_value")))
    )
    assert bad.isEmpty()
    # clicks with NO prior error for the user must be NULL
    first_err = errors.groupBy("user_id").agg(F.min("err_ts").alias("first_err_ts"))
    nulls = joined.filter(F.col("last_error_value").isNull()).join(
        first_err, "user_id", "left"
    )
    assert nulls.filter(
        F.col("first_err_ts").isNotNull() & (F.col("first_err_ts") <= F.col("click_ts"))
    ).isEmpty()


def test_asof_is_single_shuffle(spark):
    """The as-of plan must contain exactly one exchange (the user_id
    hash partitioning) — no join, no cross product."""
    plan = REGISTRY["q_j7_asof"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    body = plan.split("AdaptiveSparkPlan")[-1]
    # final orderBy adds a range exchange; the compute itself must have 1
    assert body.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in body, plan


def test_sessions_respect_gap(spark):
    """Within a session, consecutive gaps < 30 min; session starts are
    >= 30 min after the previous session's last event per user."""
    res = REGISTRY["q_st3_session"].spark(spark, SF_SMOKE).collect()
    per_user: dict[int, list] = {}
    for r in res:
        per_user.setdefault(r.user_id, []).append(r)
    events = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .collect()
    )
    ev: dict[int, list[int]] = {}
    for r in events:
        ev.setdefault(r.user_id, []).append(r.us)
    gap_us = 30 * 60 * 1_000_000
    for uid, sessions in per_user.items():
        times = sorted(ev[uid])
        # total events across sessions == user's event count
        assert sum(s.n_events for s in sessions) == len(times)
        starts = sorted(s.session_start_us for s in sessions)
        for a, b in zip(starts, starts[1:]):
            in_prev = [t for t in times if a <= t < b]
            assert b - max(in_prev) >= gap_us  # a real gap separates sessions


def test_zscore_mean_zero_per_group(spark):
    """applyInPandas z-scores must average ~0 within every multi-order
    customer group (z-score invariant)."""
    res = REGISTRY["q_udf_zscore"].spark(spark, SF_SMOKE)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    stats = (
        res.join(orders, "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.avg("z").alias("mean_z"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    # z values are rounded to 4 decimals, so the group mean carries up
    # to ~5e-5 of rounding noise
    assert stats.filter(F.abs(F.col("mean_z")) > 1e-4).isEmpty()


def test_bpe_tokens_at_least_whitespace_tokens(spark):
    """BPE-ish splitting is finer than whitespace splitting: per doc,
    n_tokens(bpe) >= n_tokens(whitespace) whenever text is non-empty."""
    bpe = REGISTRY["q_text_tokens_bpe"].spark(spark, SF_SMOKE)
    ws = REGISTRY["q_x3_tokens"].spark(spark, SF_SMOKE)
    ws_col = [c for c in ws.columns if c != "doc_id"][0]
    j = bpe.join(ws.withColumnRenamed(ws_col, "ws_tokens"), "doc_id")
    assert j.filter(F.col("n_tokens") < F.col("ws_tokens")).isEmpty()


def test_ewma_constant_series_closed_form(spark):
    """On a constant value series the truncated EWMA equals
    v * (1 - q^L) / (1 - q) for frame length L — pins the weight
    normalization (newest weight 1, geometric decay backwards)."""
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        EWMA_DECAY,
        EWMA_SPAN,
        q_ts2_ewma,
    )

    out = q_ts2_ewma(spark, SF_SMOKE).limit(0)  # plan compiles
    # closed form check on a synthetic constant stream via the same code
    # path: monkey-free — build events in-memory and reuse the fold by
    # asserting against the registered query on real data for one user.
    rows = (
        q_ts2_ewma(spark, SF_SMOKE)
        .filter("user_id = 0")
        .orderBy("event_id")
        .collect()
    )
    import math

    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    vals = [
        float(r.value)
        for r in e.filter("user_id = 0").orderBy("ts", "event_id").collect()
    ]
    assert len(rows) == len(vals)
    # brute-force reference for every row
    for i, r in enumerate(rows):
        lo = max(0, i - (EWMA_SPAN - 1))
        frame = vals[lo : i + 1]
        want = sum(
            v * EWMA_DECAY ** (len(frame) - 1 - k) for k, v in enumerate(frame)
        )
        assert math.isclose(r.ewma, round(want, 6), abs_tol=2e-6), (i, r)


def test_funnel_conversions_match_bruteforce(spark):
    """Per-user funnel counts equal a brute-force pairwise check
    (every signup scanned against every later purchase)."""
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import q_ev1_funnel

    got = {r.user_id: (r.n_signups, r.n_converted) for r in q_ev1_funnel(spark, SF_SMOKE).collect()}
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in e:
        by_user[r.user_id].append(r)
    H = 3600
    for uid, evs in by_user.items():
        sign = [r for r in evs if r.event_type == "signup"]
        if not sign:
            assert uid not in got
            continue
        purch = [(r.ts, r.event_id) for r in evs if r.event_type == "purchase"]
        # frame semantics: a purchase qualifies iff it sorts at-or-after
        # the signup under (ts, event_id) and lands within the window
        conv = sum(
            1
            for s in sign
            if any(
                (pts, peid) >= (s.ts, s.event_id)
                and (pts - s.ts).total_seconds() <= H
                for pts, peid in purch
            )
        )
        assert got[uid] == (len(sign), conv), uid


def test_interp_repairs_all_gaps_within_bounds(spark):
    """q_ts3_interp: unmasked rows pass through exactly; masked rows are
    reconstructed inside the envelope of that user's observed values
    (linear interpolation can never overshoot its anchors), and every
    row is non-null (each user has at least one observed value)."""
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        INTERP_MISS_MOD,
    )

    res = REGISTRY["q_ts3_interp"].spark(spark, SF_SMOKE)
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    joined = res.join(events, ["event_id", "user_id"])
    assert joined.filter(F.col("value_interp").isNull()).isEmpty()
    # pass-through on observed rows
    assert joined.filter(
        ~F.col("was_missing")
        & (F.abs(F.col("value_interp") - F.round("value", 4)) > 1e-9)
    ).isEmpty()
    assert (
        joined.filter(
            F.col("was_missing")
            != (F.col("event_id") % INTERP_MISS_MOD == 0)
        ).isEmpty()
    )
    # masked rows stay inside the user's observed min/max envelope
    env = (
        events.filter(F.col("event_id") % INTERP_MISS_MOD != 0)
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    assert (
        joined.filter(F.col("was_missing"))
        .join(env, "user_id")
        .filter(
            (F.col("value_interp") < F.col("lo") - 1e-6)
            | (F.col("value_interp") > F.col("hi") + 1e-6)
        )
        .isEmpty()
    )
