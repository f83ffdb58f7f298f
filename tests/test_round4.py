"""Round-4 operators: property/behavior tests beyond the oracle gate.

The oracle sweep proves fixture equality; these tests pin the parts the
oracle cannot see — fixpoint semantics against brute-force references
on GENERATED graphs (k-core, SSSP), exact bit-edge behavior (bitmap
distinct), and deterministic tie-breaking (OHLC open/close).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
from neo4j_blue_green_arrow_etl_spark.operators.graph import (
    kcore_edges,
    sssp_distances,
)

from conftest import SF_SMOKE


def _random_graph(seed: int, n: int = 60, m: int = 140):
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _kcore_reference(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Brute-force peel: returns {node: core_degree} of the k-core."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
            changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


@pytest.mark.parametrize("seed", [1, 7])
def test_kcore_matches_bruteforce_on_random_graph(spark, seed):
    edges = _random_graph(seed)
    df = spark.createDataFrame(edges, "a int, b int")
    core = kcore_edges(df.select(F.col("a").cast("string"), F.col("b").cast("string")), k=3)
    got = (
        core.groupBy("a").agg(F.count(F.lit(1)).alias("d")).collect()
    )
    want = _kcore_reference(edges, 3)
    assert {int(r.a): r.d for r in got} == want


def _dijkstra(edges: list[tuple[int, int, float]], src: int) -> dict[int, float]:
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, float("inf")):
            continue
        for u, w in adj.get(v, []):
            nd = d + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


@pytest.mark.parametrize("seed", [3, 11])
def test_sssp_matches_dijkstra_on_random_graph(spark, seed):
    rnd = random.Random(seed)
    edges = [(a, b, float(rnd.randint(1, 9))) for a, b in _random_graph(seed)]
    df = spark.createDataFrame(edges, "a int, b int, w double").select(
        F.col("a").cast("string"), F.col("b").cast("string"), "w"
    )
    src = str(edges[0][0])
    got = {
        r.a: r.dist for r in sssp_distances(df, source=src, max_rounds=60).collect()
    }
    want = _dijkstra(edges, int(src))
    assert set(got) == {str(v) for v in want}
    for v, d in want.items():
        assert got[str(v)] == pytest.approx(d, abs=1e-9)


def test_sssp_disconnected_nodes_are_omitted(spark):
    df = spark.createDataFrame(
        [("x", "y", 1.0), ("p", "q", 2.0)], "a string, b string, w double"
    )
    got = {r.a: r.dist for r in sssp_distances(df, source="x").collect()}
    assert got == {"x": 0.0, "y": 1.0}


def test_bitmap_distinct_handles_word_boundaries(spark):
    """user_ids straddling the 64-bit word edges (0, 63, 64, 127, 128)
    must each count once; duplicates collapse via bit_or idempotence."""
    ids = [0, 0, 63, 63, 64, 127, 128, 128, 128, 4096]
    df = spark.createDataFrame(
        [("t", i) for i in ids], "event_type string, user_id long"
    )
    words = (
        df.select(
            "event_type",
            F.expr("user_id DIV 64").alias("word"),
            F.expr("CAST(1 AS BIGINT) << CAST(user_id % 64 AS INT)").alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    n = (
        words.groupBy("event_type")
        .agg(F.sum(F.bit_count("mask")).cast("long").alias("n"))
        .collect()[0]
        .n
    )
    assert n == len(set(ids))


def test_ohlc_tie_break_is_deterministic(spark):
    """Two events at the SAME timestamp: open must take the lower
    event_id's value and close the higher one's — the padded order key
    pins this on both engines."""
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import q_ts5_ohlc

    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 10.0, "{}"),
        (2, "2024-01-01 00:00:00", 7, "click", 99.0, "{}"),
        (3, "2024-01-01 01:00:00", 7, "click", 50.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = q_ts5_ohlc(spark, td).collect()
    assert len(out) == 1
    bar = out[0]
    assert bar.open == 10.0 and bar.close == 50.0
    assert bar.high == 99.0 and bar.low == 10.0 and bar.n == 3


def test_anomaly_flags_injected_spike(spark):
    """A flat series with one large spike: exactly the spike is flagged
    (the exclusive trailing frame keeps the spike out of its own
    baseline)."""
    from neo4j_blue_green_arrow_etl_spark.operators.temporal import (
        ANOM_WINDOW,
        q_ts6_anomaly,
    )

    rows = []
    for i in range(ANOM_WINDOW * 3):
        v = 1000.0 if i == ANOM_WINDOW * 2 else 10.0 + (i % 5) * 0.1
        rows.append((i, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", 1, "m", v, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = q_ts6_anomaly(spark, td).collect()
    assert [r.event_id for r in out] == [ANOM_WINDOW * 2]
    assert out[0].z > 3


def test_nodesim_scores_are_valid_jaccard(spark):
    rows = REGISTRY["q_g9_nodesim"].spark(spark, SF_SMOKE).collect()
    assert rows, "frontier produced no similarity pairs"
    from neo4j_blue_green_arrow_etl_spark.operators.graph import NODESIM_TOPK

    per_src: dict = {}
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.src != r.other
        per_src.setdefault(r.src, []).append(r.jaccard)
    for src, js in per_src.items():
        assert len(js) <= NODESIM_TOPK
        assert js == sorted(js, reverse=True)


def test_bm25_prefers_term_dense_docs(spark):
    """The top-ranked doc must contain at least one query term, and
    scores must be positive and descending."""
    from neo4j_blue_green_arrow_etl_spark.operators.textops import BM25_QUERY

    rows = REGISTRY["q_x33_bm25"].spark(spark, SF_SMOKE).collect()
    assert rows
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    top_doc = rows[0].doc_id
    text = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") == top_doc)
        .collect()[0]
        .text
    )
    assert any(t in text.split(" ") for t in BM25_QUERY)


def test_lsh_bucket_cap_thins_giant_buckets_but_keeps_clusters(spark):
    """An oversized LSH bucket (all docs identical) must emit LINEAR
    star candidates, not quadratic all-pairs — while the connected
    component over the verified pairs still covers every member.
    Small buckets keep the full pair set."""
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        MINHASH_BUCKET_CAP,
        lsh_band_candidates,
    )

    n_big = MINHASH_BUCKET_CAP + 100
    rows = [(i, 0, 777) for i in range(n_big)]  # one giant bucket
    rows += [(1000 + i, 1, 888) for i in range(4)]  # one small bucket
    bands = spark.createDataFrame(rows, "doc_id long, band int, bh long")
    cand = lsh_band_candidates(bands).collect()
    big = [(r.a, r.b) for r in cand if r.b < 1000]
    small = [(r.a, r.b) for r in cand if r.b >= 1000]
    # giant bucket: n-1 star pairs, all anchored at the min id
    assert len(big) == n_big - 1
    assert all(a == 0 for a, _ in big)
    # star preserves the component: union-find over pairs -> one cluster
    parent = list(range(n_big))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in big:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n_big)}) == 1
    # small bucket: full pair set (4 choose 2)
    assert len(small) == 6


def test_bench_report_refuses_negative_deltas_and_renders_corrupt():
    """ADVICE r3: SHUFFLE.md once rendered negative stage deltas as
    real numbers. fmt() must hard-fail on negatives (regenerate with
    the fixed bench.py) and render bench.py's nulled rows as
    'corrupt', never as data."""
    import tools_path  # noqa: F401

    import bench_report

    assert bench_report.fmt(None) == "corrupt"
    assert bench_report.fmt(0) == "0"
    assert bench_report.fmt(25_000_000) == "25 MB"
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="negative stage delta"):
        bench_report.fmt(-1)
