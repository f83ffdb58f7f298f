"""Tests for the mergeable-sketch, chunking, SCD2, and histogram
operators added in round 2 (q_a11_hll, q_x14_chunk, q_w4_scd2,
q_f9_bucket)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
from neo4j_blue_green_arrow_etl_spark.operators.curation import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
)
from neo4j_blue_green_arrow_etl_spark.operators.sketches import (
    HLL_LGK,
    distinct_sketches,
)

from conftest import SF_ORACLE, SF_SMOKE


# ---------------------------------------------------------------------------
# HLL sketches
# ---------------------------------------------------------------------------


def test_hll_estimate_tracks_exact_within_error_bound(spark):
    """At sf0.01 cardinalities the sparse-mode sketch is exact; the
    documented contract for scale is the DataSketches bound (~1.6% rse
    at lgK=14) — assert a conservative 5% ceiling per group."""
    est = {
        r.day: r.approx_users
        for r in REGISTRY["q_a11_hll"].spark(spark, SF_ORACLE).collect()
    }
    e = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    exact = {
        r.day: r.exact
        for r in e.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for day, approx in est.items():
        rel_err = abs(approx - exact[day]) / exact[day]
        assert rel_err <= 0.05, f"{day}: {approx} vs {exact[day]}"


def test_hll_sketches_merge_across_regroupings(spark):
    """The re-aggregation contract: merging per-(day, type) sketches to
    a GLOBAL estimate equals sketching the raw column directly —
    sketch-of-parts == sketch-of-whole."""
    e = spark.read.parquet(f"{SF_ORACLE}/events.parquet").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    parts = distinct_sketches(e, "user_id", "day", "event_type")
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).collect()[0].n
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(HLL_LGK))).alias("n")
    ).collect()[0].n
    assert merged == direct


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def test_chunk_reconstruction_and_overlap(spark):
    """Chunk 0 must be the document's first CHUNK_SIZE words; each next
    chunk must start exactly CHUNK_STRIDE words later (checked via the
    overlap suffix/prefix relation); short docs yield one short chunk."""
    out = REGISTRY["q_x14_chunk"].spark(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    joined = (
        out.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("n_tokens").alias("max_tok"),
            F.min("n_tokens").alias("min_tok"),
        )
        .join(docs.select("doc_id", F.size(F.split("text", " ")).alias("n_words")), "doc_id")
        .collect()
    )
    assert joined, "no documents chunked"
    for r in joined:
        expected = -(-r.n_words // CHUNK_STRIDE)  # ceil
        assert r.n_chunks == expected, f"doc {r.doc_id}"
        assert r.max_tok <= CHUNK_SIZE
        assert r.min_tok >= 1

    # word-level check on one document
    row = docs.select("doc_id", "text").first()
    words = row.text.split(" ")
    chunks = {
        r.chunk_id: r.chunk_text
        for r in out.filter(F.col("doc_id") == row.doc_id).collect()
    }
    assert chunks[0] == " ".join(words[:CHUNK_SIZE])
    if len(chunks) > 1:
        assert chunks[1] == " ".join(words[CHUNK_STRIDE : CHUNK_STRIDE + CHUNK_SIZE])


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


def test_scd2_intervals_tile_the_timeline(spark):
    """Per customer: intervals are disjoint and contiguous (each
    valid_to equals the next valid_from), and exactly one row is
    current (open-ended)."""
    rows = REGISTRY["q_w4_scd2"].spark(spark, SF_SMOKE).collect()
    by_cust: dict[str, list] = {}
    for r in rows:
        by_cust.setdefault(r.customer_id, []).append(r)
    assert by_cust
    for cust, ivs in by_cust.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current) == 1, cust
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, cust


# ---------------------------------------------------------------------------
# Histogram
# ---------------------------------------------------------------------------


def test_bucket_histogram_covers_all_rows_and_respects_edges(spark):
    out = REGISTRY["q_f9_bucket"].spark(spark, SF_ORACLE).collect()
    total = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").count()
    assert sum(r.cnt for r in out) == total
    for r in out:
        if 1 <= r.bucket <= 12:
            lo_edge, hi_edge = (r.bucket - 1) * 50000, r.bucket * 50000
            assert r.lo >= lo_edge and r.hi < hi_edge, r


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance
# ---------------------------------------------------------------------------


def test_incremental_agg_from_materialized_partials(spark, tmp_path):
    """The production shape: partials are WRITTEN per ingest batch, then
    combined later without the raw data — three arbitrary date slices,
    partials round-tripped through parquet, combined result must equal
    the direct aggregate of the full table."""
    from neo4j_blue_green_arrow_etl_spark.operators.curation import (
        combine_partials,
        partial_order_aggs,
    )

    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    cuts = ["1997-01-01", "1999-06-01"]
    slices = [
        o.filter(F.col("o_orderdate") < cuts[0]),
        o.filter((F.col("o_orderdate") >= cuts[0]) & (F.col("o_orderdate") < cuts[1])),
        o.filter(F.col("o_orderdate") >= cuts[1]),
    ]
    paths = []
    for i, s in enumerate(slices):
        p = str(tmp_path / f"partial_{i}")
        partial_order_aggs(s).write.parquet(p)
        paths.append(p)
    combined = combine_partials(*[spark.read.parquet(p) for p in paths])
    direct = combine_partials(partial_order_aggs(o))
    got = {tuple(r) for r in combined.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want
