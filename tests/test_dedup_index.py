"""Persisted bucketed shingle index (operators/dedup_index.py): the
at-rest probe-join layout for incremental/streaming dedup. Pins the
three claims the module makes: (1) the probe join is co-located on the
index side — zero shingle Exchange for the corpus; (2) the indexed
probe is byte-identical to the recompute form; (3) batch appends are
per-partition and crash replays overwrite, not duplicate — across a
catalog-loss restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
    _COMPACT_MANIFEST,
    append_index_batch,
    build_dedup_index,
    compact_index,
    ensure_index_table,
    neardup_match_pairs,
    postings_with_sizes,
    probe_dedup_index,
)

from conftest import SF_ORACLE, SF_SMOKE


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_index_side_join_is_shuffle_free(spark, tmp_path):
    """The whole point of the bucketed layout: the corpus index scan
    must arrive at the shingle equi-join already hash-partitioned
    (Bucketed: true), so the ONLY shingle Exchange in the probe join
    is the small batch side."""
    table = build_dedup_index(spark, SF_SMOKE, str(tmp_path / "idx"))
    batch = _docs(spark, SF_SMOKE).filter(F.col("doc_id") % 10 == 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = neardup_match_pairs(
            postings_with_sizes(batch),
            spark.table(table).select("doc_id", "shingle", "n"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    scan_lines = [
        ln for ln in plan.splitlines() if "dedup_shingle_index" in ln
    ]
    assert scan_lines and all("Bucketed: true" in ln for ln in scan_lines), plan
    shingle_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(shingle" in ln
    ]
    assert len(shingle_exchanges) == 1, plan  # batch side only
    # and no sort either: the SHUFFLE_HASH hint streams the state
    # buckets — a SortMergeJoin here would re-sort the entire
    # accumulated state on EVERY probe (multi-file buckets forfeit the
    # on-disk sort), which measured slower than recomputing at x16
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_indexed_probe_equals_recompute(spark):
    """q_x44b (index probe) and q_x44 (full recompute) share one
    oracle; their results must be row-identical."""
    a = sorted(
        map(tuple, REGISTRY["q_x44_incrdedup"].spark(spark, SF_ORACLE).collect())
    )
    b = sorted(
        map(
            tuple,
            REGISTRY["q_x44b_incrdedup_indexed"].spark(spark, SF_ORACLE).collect(),
        )
    )
    assert a == b
    assert len(a) > 0  # fixture actually exercises matches


def test_append_replay_and_catalog_restart(spark, tmp_path):
    """Exactly-once at the table layer: a replayed batch overwrites
    ONLY its own partition; dropping the catalog entry (what a process
    restart does to the in-memory catalog) and re-ensuring recovers
    every batch from disk."""
    path = str(tmp_path / "state_idx")
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).limit(40).select("doc_id", "text")
    b0 = postings_with_sizes(docs.filter("doc_id % 2 = 0"))
    b1 = postings_with_sizes(docs.filter("doc_id % 2 = 1"))
    append_index_batch(spark, table, b0, 0)
    append_index_batch(spark, table, b1, 1)
    full = spark.table(table).count()
    assert full == b0.count() + b1.count()

    # crash replay of batch 1 with a SUBSET (simulates a partial prior
    # attempt being corrected): partition replaced, batch 0 untouched
    b1_sub = postings_with_sizes(
        docs.filter("doc_id % 2 = 1").limit(5)
    )
    append_index_batch(spark, table, b1_sub, 1)
    t = spark.table(table)
    assert t.filter("batch_id = 0").count() == b0.count()
    assert t.filter("batch_id = 1").count() == b1_sub.count()

    # catalog restart: metadata is gone, data is not. A real restart
    # begins with an empty ensure cache; simulate that too.
    spark.sql(f"DROP TABLE {table}")
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import _ENSURED

    _ENSURED.clear()
    table2 = ensure_index_table(spark, path)
    assert table2 == table
    t2 = spark.table(table2)
    assert t2.count() == b0.count() + b1_sub.count()
    # any-earlier pruning predicate still partition-prunes
    assert t2.filter("batch_id < 1").count() == b0.count()


def test_compact_folds_partitions_preserving_results(spark, tmp_path):
    """compact_index must be invisible to readers: same rows, same
    probe matches — but one partition and ONE file per bucket where
    there was one per (batch, bucket)."""
    from pathlib import Path as P

    path = str(tmp_path / "cidx")
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).select("doc_id", "text")
    for b in range(3):
        append_index_batch(
            spark, table, postings_with_sizes(docs.filter(f"doc_id % 3 = {b}")), b
        )
    batch = _docs(spark, SF_SMOKE).filter("doc_id % 10 = 0")
    before_rows = sorted(map(tuple, spark.table(table).collect()))
    before_probe = sorted(
        map(tuple, probe_dedup_index(spark, batch, table).collect())
    )
    files_before = len(list(P(path).glob("batch_id=*/part-*")))

    compact_index(spark, path, 2)

    after = spark.table(table)
    # every surviving row sits in ONE fold partition — a fresh
    # NEGATIVE generation id, never a live source partition (dynamic
    # overwrite deletes its target dir before committing, so folding
    # into a live id would have a data-loss crash window)
    fold_ids = {
        r[0] for r in after.select("batch_id").distinct().collect()
    }
    assert len(fold_ids) == 1 and next(iter(fold_ids)) < 0, fold_ids
    assert sorted(
        map(tuple, after.select("doc_id", "shingle", "n").collect())
    ) == sorted((r[0], r[1], r[2]) for r in before_rows)
    after_probe = sorted(
        map(tuple, probe_dedup_index(spark, batch, table).collect())
    )
    assert after_probe == before_probe
    files_after = len(list(P(path).glob("batch_id=*/part-*")))
    assert files_after < files_before  # 3 batches x buckets -> 1 x buckets
    assert not P(path, _COMPACT_MANIFEST).exists()
    # a later ingest lands on top of the fold unharmed
    append_index_batch(
        spark, table, postings_with_sizes(docs.limit(5)), 3
    )
    assert after.filter("batch_id = 3").count() > 0


def test_compact_crash_recovery_both_branches(spark, tmp_path):
    """The manifest protocol: (a) crash BEFORE the fold committed ->
    recovery aborts, sources intact; (b) crash AFTER the fold
    committed but before source deletion -> recovery finishes the
    deletes. Both via the same ensure_index_table() entry point a
    restarted process uses."""
    import json
    from pathlib import Path as P

    path = str(tmp_path / "ridx")
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).limit(60).select("doc_id", "text")
    for b in range(2):
        append_index_batch(
            spark, table, postings_with_sizes(docs.filter(f"doc_id % 2 = {b}")), b
        )
    total = spark.table(table).count()

    # (a) manifest written, fold NOT committed (rows can't match):
    # recovery must abort with EVERY source partition intact —
    # including partition 1 == through_batch, which the fold target
    # (a fresh negative id) must never alias
    P(path, _COMPACT_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": total + 999})
    )
    table = ensure_index_table(spark, path)
    assert not P(path, _COMPACT_MANIFEST).exists()
    assert spark.table(table).count() == total  # nothing lost
    assert spark.table(table).filter("batch_id = 0").count() > 0
    assert spark.table(table).filter("batch_id = 1").count() > 0

    # (b) fold committed (partition -1 := all rows), deletes crashed
    folded = (
        spark.table(table)
        .selectExpr("doc_id", "shingle", "n")
        .localCheckpoint()
    )
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        _insert_dynamic,
    )

    _insert_dynamic(
        folded.selectExpr("doc_id", "shingle", "n", "-1 as batch_id"), table
    )
    spark.sql(f"REFRESH TABLE {table}")
    P(path, _COMPACT_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": total})
    )
    # partitions 0/1 still on disk next to their copies inside the
    # fold: the exact duplicate window recovery exists to close
    assert spark.table(table).count() == 2 * total
    table = ensure_index_table(spark, path)
    assert not P(path, _COMPACT_MANIFEST).exists()
    assert spark.table(table).count() == total
    assert spark.table(table).filter("batch_id >= 0").count() == 0


def test_compact_abort_discards_partial_fold_target(spark, tmp_path):
    """Crash DURING the fold write can leave a partial target
    partition (count != manifest rows). Recovery must abort by
    discarding the partial target — it never held live data — and
    keep every source partition."""
    import json
    from pathlib import Path as P

    path = str(tmp_path / "aidx")
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).limit(60).select("doc_id", "text")
    for b in range(2):
        append_index_batch(
            spark, table, postings_with_sizes(docs.filter(f"doc_id % 2 = {b}")), b
        )
    total = spark.table(table).count()

    # simulate a partial fold: SOME rows landed in target -1
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        _insert_dynamic,
    )

    partial = (
        spark.table(table)
        .limit(7)
        .selectExpr("doc_id", "shingle", "n", "-1 as batch_id")
        .localCheckpoint()
    )
    _insert_dynamic(partial, table)
    spark.sql(f"REFRESH TABLE {table}")
    P(path, _COMPACT_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": total})
    )
    table = ensure_index_table(spark, path)
    assert not P(path, _COMPACT_MANIFEST).exists()
    t = spark.table(table)
    assert t.filter("batch_id = -1").count() == 0  # partial discarded
    assert t.count() == total  # sources untouched
    assert not list(P(path).glob("batch_id=-1"))


def test_compacted_probe_equals_recompute(spark):
    """q_x44c (append x4 -> compact -> probe) shares q_x44's oracle;
    results must be row-identical."""
    a = sorted(
        map(tuple, REGISTRY["q_x44_incrdedup"].spark(spark, SF_ORACLE).collect())
    )
    c = sorted(
        map(
            tuple,
            REGISTRY["q_x44c_incrdedup_compacted"].spark(spark, SF_ORACLE).collect(),
        )
    )
    assert a == c and len(a) > 0


def test_file_hash_matches_bucket_id(spark, tmp_path):
    """Pins the assumption bucket-file pruning stands on: F.hash (the
    Murmur3 expression) pmod numBuckets equals the bucket id encoded
    in each bucketed part file's name."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        _bucket_of,
    )

    path = str(tmp_path / "hidx")
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).limit(80).select("doc_id", "text")
    append_index_batch(spark, table, postings_with_sizes(docs), 0)
    from pathlib import Path as P

    checked = 0
    for f in P(path).glob("batch_id=*/part-*"):
        rows = (
            spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT")
            .parquet(str(f))
            .select(F.pmod(F.hash("shingle"), F.lit(32)).alias("b"))
            .distinct()
            .collect()
        )
        assert {r.b for r in rows} <= {_bucket_of(f.name)}, f.name
        checked += 1
    assert checked > 1


def test_pruned_probe_equals_full_probe(spark, tmp_path):
    """A small batch over a wide (256-bucket) index must read only the
    buckets its shingles hash into, and return exactly the full
    probe's matches."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        probe_dedup_index_pruned,
    )

    path = str(tmp_path / "pidx")
    table = ensure_index_table(spark, path, buckets=256)
    docs = _docs(spark, SF_SMOKE).select("doc_id", "text")
    append_index_batch(
        spark, table, postings_with_sizes(docs.filter("doc_id % 10 != 0")), 0
    )
    batch = docs.filter("doc_id % 10 = 0").limit(3)
    full = sorted(
        map(tuple, probe_dedup_index(spark, batch, table).collect())
    )
    pruned = sorted(
        map(
            tuple,
            probe_dedup_index_pruned(spark, batch, path, buckets=256).collect(),
        )
    )
    assert pruned == full
    assert full  # fixture exercises real matches
    # the batch's shingles must NOT touch every bucket at this width
    touched = {
        r[0]
        for r in postings_with_sizes(batch)
        .select(F.pmod(F.hash("shingle"), F.lit(256)).alias("b"))
        .distinct()
        .collect()
    }
    assert len(touched) < 256


def test_probe_dedup_index_matches_earlier_rule(spark, tmp_path):
    """probe_dedup_index must match batch docs against BOTH the index
    and earlier docs of the batch itself (id order), mirroring
    q_x44's semantics on a corpus with known duplicate structure."""
    docs = spark.range(12).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta "),
            F.when(F.col("id") % 3 < 2, F.lit("shared tail"))
            .otherwise(F.concat(F.lit("unique nr "), F.col("id").cast("string"))),
        ).alias("text"),
    )
    # corpus = ids not divisible by 4; batch = ids divisible by 4
    path = str(tmp_path / "probe_idx")
    table = ensure_index_table(spark, path)
    append_index_batch(
        spark,
        table,
        postings_with_sizes(docs.filter("doc_id % 4 != 0")),
        0,
    )
    batch = docs.filter("doc_id % 4 = 0")
    got = {
        (r.doc_new, r.doc_match)
        for r in probe_dedup_index(spark, batch, table).collect()
    }
    # Brute-force reference: batch doc d matches e iff e is a corpus
    # doc or an earlier batch doc and exact 3-gram Jaccard >= 0.5.
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
    )

    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    sets = {
        d: {tuple(w[i : i + 3]) for i in range(len(w) - 2)}
        for d, w in texts.items()
    }
    want = set()
    for d in sets:
        if d % 4 != 0:
            continue
        for e in sets:
            if e == d or (e % 4 == 0 and e >= d):
                continue
            inter = len(sets[d] & sets[e])
            if inter / (len(sets[d]) + len(sets[e]) - inter) >= JACCARD_THRESHOLD:
                want.add((d, e))
    assert got == want
    assert want  # fixture exercises both index and intra-batch matches
    assert any(e % 4 == 0 for _, e in want)  # intra-batch pair present


def test_pruned_probe_bucket_count_from_sidecar(spark, tmp_path):
    """The bucket count is the INDEX's property, not the caller's: a
    caller-supplied count that contradicts the _BUCKETS sidecar must
    raise (wrong pmod ids silently drop files otherwise), and with no
    count supplied the sidecar value is used."""
    import pytest

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        index_bucket_count,
        probe_dedup_index_pruned,
    )

    path = str(tmp_path / "sidx")
    ensure_index_table(spark, path, buckets=64)
    docs = _docs(spark, SF_SMOKE).limit(20).select("doc_id", "text")
    append_index_batch(spark, table := ensure_index_table(spark, path, 64),
                       postings_with_sizes(docs.filter("doc_id % 2 = 0")), 0)
    assert index_bucket_count(path) == 64
    batch = docs.filter("doc_id % 2 = 1").limit(2)
    with pytest.raises(ValueError, match="64 buckets"):
        probe_dedup_index_pruned(spark, batch, path, buckets=32)
    # sidecar-driven read works and matches the full probe
    full = sorted(map(tuple, probe_dedup_index(spark, batch, table).collect()))
    pruned = sorted(
        map(tuple, probe_dedup_index_pruned(spark, batch, path).collect())
    )
    assert pruned == full
    # an index that was never ensured has no sidecar: refuse to guess
    with pytest.raises(ValueError, match="sidecar"):
        index_bucket_count(str(tmp_path / "nonexistent"))


def test_pruned_probe_recovers_pending_compaction_first(spark, tmp_path):
    """ADVICE r7: a crash between the fold commit and the source
    deletes leaves BOTH on disk; a path-glob probe that skipped
    recovery would read the postings twice, doubling the pair count c
    while n stays fixed — spurious matches. The pruned probe must
    finish the pending fold before enumerating part files."""
    import json
    from pathlib import Path as P

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        _insert_dynamic,
        probe_dedup_index_pruned,
    )

    path = str(tmp_path / "recidx")
    table = ensure_index_table(spark, path)
    docs = _docs(spark, SF_SMOKE).select("doc_id", "text")
    for b in range(2):
        append_index_batch(
            spark, table,
            postings_with_sizes(docs.filter(f"doc_id % 10 != 0 and doc_id % 2 = {b}")),
            b,
        )
    batch = docs.filter("doc_id % 10 = 0")
    clean = sorted(
        map(tuple, probe_dedup_index(spark, batch, table).collect())
    )
    assert clean  # fixture has matches

    # committed fold at -1, source deletes crashed: duplicates on disk
    total = spark.table(table).count()
    folded = (
        spark.table(table)
        .selectExpr("doc_id", "shingle", "n", "-1 as batch_id")
        .localCheckpoint()
    )
    _insert_dynamic(folded, table)
    spark.sql(f"REFRESH TABLE {table}")
    P(path, _COMPACT_MANIFEST).write_text(
        json.dumps({"through": 1, "target": -1, "rows": total})
    )
    assert len(list(P(path).glob("batch_id=*"))) == 3  # dup window open

    pruned = sorted(
        map(tuple, probe_dedup_index_pruned(spark, batch, path).collect())
    )
    assert pruned == clean  # recovery ran: no double-counted postings
    assert not P(path, _COMPACT_MANIFEST).exists()


def test_auto_probe_routes_both_branches(spark, tmp_path):
    """probe_dedup_index_auto must take the PRUNED path for a batch
    touching few buckets and the co-located FULL path for one touching
    most — and return the full probe's rows either way."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        AUTO_PRUNE_THRESHOLD,
        _touched_buckets,
        probe_dedup_index_auto,
    )

    path = str(tmp_path / "autoidx")
    table = ensure_index_table(spark, path, buckets=512)
    docs = _docs(spark, SF_SMOKE).select("doc_id", "text")
    append_index_batch(
        spark, table, postings_with_sizes(docs.filter("doc_id % 10 != 0")), 0
    )
    small = docs.filter("doc_id % 10 = 0").limit(2)
    big = docs.filter("doc_id % 10 = 0")
    # pin which branch each batch takes (the routing predicate itself)
    small_touched = _touched_buckets(postings_with_sizes(small), 512)
    big_touched = _touched_buckets(postings_with_sizes(big), 512)
    assert len(small_touched) <= AUTO_PRUNE_THRESHOLD * 512, len(small_touched)
    assert len(big_touched) > AUTO_PRUNE_THRESHOLD * 512, len(big_touched)
    for batch in (small, big):
        want = sorted(
            map(tuple, probe_dedup_index(spark, batch, table).collect())
        )
        got = sorted(
            map(tuple, probe_dedup_index_auto(spark, batch, path).collect())
        )
        assert got == want


def test_ensure_rejects_bucket_width_mismatch_and_reset_allows_rewidth(
    spark, tmp_path
):
    """The DDL bucket count is structural: ensuring an existing index
    at a different width must raise (a silent IF NOT EXISTS would keep
    the old layout while the caller assumes the new one), and
    reset_index is the sanctioned way to change width — it wipes
    files, catalog entry, and the ensure cache together."""
    import pytest

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        _ENSURED,
        index_bucket_count,
        reset_index,
    )

    path = str(tmp_path / "widx")
    table = ensure_index_table(spark, path, buckets=64)
    docs = _docs(spark, SF_SMOKE).limit(10).select("doc_id", "text")
    append_index_batch(spark, table, postings_with_sizes(docs), 0)
    assert index_bucket_count(path) == 64

    # a fresh session (empty cache) ensuring at the wrong width: raise
    _ENSURED.clear()
    with pytest.raises(ValueError, match="64"):
        ensure_index_table(spark, path, buckets=32)

    # reset + re-ensure at the new width: clean slate, new sidecar
    reset_index(spark, path)
    table2 = ensure_index_table(spark, path, buckets=32)
    assert index_bucket_count(path) == 32
    assert spark.table(table2).count() == 0
    append_index_batch(spark, table2, postings_with_sizes(docs), 0)
    from pathlib import Path as P

    assert all(
        int(f.name.split(".")[0].rsplit("_", 1)[1]) < 32
        for f in P(path).glob("batch_id=*/part-*")
    )
