"""End-to-end exactly-once streaming ingest (streaming/ingest.py):
file-source readStream -> foreachBatch -> batch-partitioned parquet.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from neo4j_blue_green_arrow_etl_spark.streaming.ingest import (
    idempotent_batch_writer,
    stream_ingest_events,
)

from conftest import SF_SMOKE


def _stage_event_files(spark, src_dir: Path, n_files: int, offset: int = 0):
    """Split the smoke events table into n single-file parquet arrivals."""
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    total = n_files + offset
    for i in range(offset, total):
        part = e.filter(F.pmod("event_id", F.lit(total)) == i).coalesce(1)
        part.write.mode("overwrite").parquet(str(src_dir / f"_stage_{i}"))
        # move the single data file up as arrival file i
        stage = src_dir / f"_stage_{i}"
        data = next(p for p in stage.glob("part-*.parquet"))
        data.rename(src_dir / f"events_{i}.parquet")
        shutil.rmtree(stage)


def test_stream_ingest_is_exactly_once_across_restarts(spark, tmp_path):
    src = tmp_path / "arrivals"
    src.mkdir()
    tgt = str(tmp_path / "target")
    ckp = str(tmp_path / "ckp")

    _stage_event_files(spark, src, 3)
    q = stream_ingest_events(spark, str(src), tgt, ckp)
    q.awaitTermination()

    out = spark.read.parquet(tgt)
    full = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = {r.event_id for r in full.collect()}
    got = [r.event_id for r in out.collect()]
    assert len(got) == len(want) and set(got) == want  # no dups, no loss
    assert out.select("_batch_id").distinct().count() == 3  # one file per batch

    # restart over the unchanged directory: a no-op
    q = stream_ingest_events(spark, str(src), tgt, ckp)
    q.awaitTermination()
    assert spark.read.parquet(tgt).count() == len(want)

    # two NEW arrivals (disjoint event slices staged with a wider modulus
    # would re-split everything, so just append copies of new ids)
    extra = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
        .limit(500)
    )
    extra.coalesce(1).write.mode("overwrite").parquet(str(src / "_stage_new"))
    data = next((src / "_stage_new").glob("part-*.parquet"))
    data.rename(src / "events_new.parquet")
    shutil.rmtree(src / "_stage_new")

    q = stream_ingest_events(spark, str(src), tgt, ckp)
    q.awaitTermination()
    out2 = spark.read.parquet(tgt)
    assert out2.count() == len(want) + 500
    assert out2.filter(F.col("event_id") >= 10_000_000).count() == 500


def test_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-recovery contract: re-running the SAME batch_id overwrites
    that batch's partition instead of appending — rows never duplicate."""
    tgt = str(tmp_path / "target")
    writer = idempotent_batch_writer(tgt)
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(100)
    writer(e, 7)
    writer(e, 7)  # replay
    out = spark.read.parquet(tgt)
    assert out.count() == 100
    assert out.select("_batch_id").distinct().collect()[0][0] == 7

    writer(e, 8)  # a different batch APPENDS (its own partition)
    assert spark.read.parquet(tgt).count() == 200


# --------------------------------------------------------------------------
# Streaming near-dup admission (streaming/neardup_ingest.py)
# --------------------------------------------------------------------------


def _neardup_docs(spark):
    """Deterministic corpus with known near-dup chains: doc 4k+1 and
    4k+2 duplicate doc 4k; 4k+3 is unique."""
    from pyspark.sql import functions as F

    base = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta "),
            F.when(
                F.col("id") % 4 < 3,
                F.concat(F.lit("group "), (F.col("id") / 4).cast("int").cast("string")),
            ).otherwise(F.concat(F.lit("unique text body number "), F.col("id").cast("string"))),
        ).alias("text"),
    )
    return base


def _expected_admitted(spark, docs):
    """The any-earlier rule computed the dumb way: doc admitted iff no
    earlier doc (global doc_id order here — batches are id-ordered
    ranges) has Jaccard >= threshold."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        shingles,
    )

    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x, y = sh.alias("x"), sh.alias("y")
    common = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("y.doc_id") < F.col("x.doc_id")),
        )
        .groupBy(F.col("x.doc_id").alias("d"), F.col("y.doc_id").alias("e"))
        .agg(F.count("*").alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    dropped = (
        common.join(sa, F.col("d") == F.col("sa.doc_id"))
        .join(sb, F.col("e") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("d")
        .distinct()
    )
    return sorted(
        r.doc_id
        for r in docs.join(dropped, docs.doc_id == dropped.d, "left_anti")
        .select("doc_id")
        .collect()
    )


def test_stream_neardup_ingest_matches_batch_rule(spark, tmp_path):
    """Draining the documents stream through the near-dup admission
    pipeline must admit EXACTLY the any-earlier-rule survivors, with
    batches = id-ordered file ranges."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.streaming.neardup_ingest import (
        admitted_ids,
        stream_neardup_ingest,
    )

    docs = _neardup_docs(spark)
    src = tmp_path / "docs_in"
    # 4 id-ordered files -> 4 micro-batches in arrival order; file
    # names sort in id order so maxFilesPerTrigger=1 preserves it
    for i in range(4):
        docs.filter(
            (F.col("doc_id") >= i * 10) & (F.col("doc_id") < (i + 1) * 10)
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"part{i}"))
    stream_neardup_ingest(
        spark,
        f"{src}/*",
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    got = sorted(r.doc_id for r in admitted_ids(spark, str(tmp_path / "out")).collect())
    want = _expected_admitted(spark, docs)
    assert got == want
    # sanity: the fixture actually has drops and keeps
    assert 0 < len(got) < 40


def test_stream_neardup_with_periodic_compaction(spark, tmp_path):
    """compact_every folds sealed state partitions mid-stream; the
    admissions must equal the uncompacted run's, and the state table
    must end with fewer partitions than batches."""
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        ensure_index_table,
    )
    from neo4j_blue_green_arrow_etl_spark.streaming.neardup_ingest import (
        admitted_ids,
        stream_neardup_ingest,
    )

    docs = _neardup_docs(spark)
    src = tmp_path / "docs_in"
    for i in range(4):
        docs.filter(
            (F.col("doc_id") >= i * 10) & (F.col("doc_id") < (i + 1) * 10)
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"part{i}"))
    stream_neardup_ingest(
        spark,
        f"{src}/*",
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        compact_every=2,
    )
    got = sorted(r.doc_id for r in admitted_ids(spark, str(tmp_path / "out")).collect())
    assert got == _expected_admitted(spark, docs)
    table = ensure_index_table(spark, str(tmp_path / "state"))
    parts = {
        r[0]
        for r in spark.table(table).select("batch_id").distinct().collect()
    }
    assert len(parts) < 4  # batches 0..2 folded at least once
    # all postings survived the folds
    n_docs = docs.count()
    assert spark.table(table).select("doc_id").distinct().count() == n_docs


def test_stream_neardup_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch with the same batchId (the crash-replay path)
    must overwrite its own files — same admissions, no duplicates."""
    from neo4j_blue_green_arrow_etl_spark.streaming.neardup_ingest import (
        admit_batch,
        admitted_ids,
    )

    docs = _neardup_docs(spark)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    b0 = docs.filter("doc_id < 10")
    b1 = docs.filter("doc_id >= 10 and doc_id < 20")
    admit_batch(spark, b0, state, out, 0)
    admit_batch(spark, b1, state, out, 1)
    first = sorted(r.doc_id for r in admitted_ids(spark, out).collect())
    # replay batch 1 (e.g. sink wrote, checkpoint commit lost)
    admit_batch(spark, b1, state, out, 1)
    second = sorted(r.doc_id for r in admitted_ids(spark, out).collect())
    assert first == second


def test_crash_between_admitted_and_state_writes_recovers(spark, tmp_path):
    """VERDICT r6 task 6: kill the batch BETWEEN its two writes
    (admitted file written, state partition not). The replay must
    re-derive the SAME admissions from the immutable prior-batch
    state — the batch_id < current read filter makes the partial
    attempt invisible — and the final corpus state must equal the
    never-crashed run's."""
    import pytest

    from neo4j_blue_green_arrow_etl_spark.operators import dedup_index
    from neo4j_blue_green_arrow_etl_spark.streaming import neardup_ingest
    from neo4j_blue_green_arrow_etl_spark.streaming.neardup_ingest import (
        admit_batch,
        admitted_ids,
    )

    docs = _neardup_docs(spark)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    b0 = docs.filter("doc_id < 10")
    b1 = docs.filter("doc_id >= 10 and doc_id < 20")
    admit_batch(spark, b0, state, out, 0)

    real_append = dedup_index.append_index_batch

    def crash_append(*a, **k):
        raise RuntimeError("injected crash between admitted and state write")

    # admit_batch resolves append_index_batch from ITS module namespace
    neardup_ingest.append_index_batch = crash_append
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            admit_batch(spark, b1, state, out, 1)
    finally:
        neardup_ingest.append_index_batch = real_append

    # admitted-b1 exists, state partition 1 does not
    assert (tmp_path / "out" / "admitted-b1.parquet").exists()
    table = dedup_index.ensure_index_table(spark, state)
    assert spark.table(table).filter("batch_id = 1").count() == 0

    crashed_partial = sorted(
        r.doc_id for r in admitted_ids(spark, out).collect()
    )
    # replay batch 1 (checkpoint never committed it)
    admit_batch(spark, b1, state, out, 1)
    after_replay = sorted(r.doc_id for r in admitted_ids(spark, out).collect())
    assert after_replay == crashed_partial  # replay changed nothing visible
    assert spark.table(table).filter("batch_id = 1").count() > 0

    # and it all equals a clean run from scratch
    state2, out2 = str(tmp_path / "state2"), str(tmp_path / "out2")
    admit_batch(spark, b0, state2, out2, 0)
    admit_batch(spark, b1, state2, out2, 1)
    clean = sorted(r.doc_id for r in admitted_ids(spark, out2).collect())
    assert after_replay == clean
    t1 = spark.table(table)
    t2 = spark.table(dedup_index.ensure_index_table(spark, state2))
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))


def test_stream_restart_with_checkpoint_after_midbatch_crash(spark, tmp_path):
    """A stream whose foreachBatch dies mid-batch must, on restart with
    the SAME checkpoint, replay that batch and continue — the final
    admitted set equals the batch rule over all arrivals, with no
    duplicate admitted files."""
    import pytest
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.streaming import neardup_ingest
    from neo4j_blue_green_arrow_etl_spark.streaming.neardup_ingest import (
        admitted_ids,
        stream_neardup_ingest,
    )

    docs = _neardup_docs(spark)
    src = tmp_path / "docs_in"
    for i in range(4):
        docs.filter(
            (F.col("doc_id") >= i * 10) & (F.col("doc_id") < (i + 1) * 10)
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"part{i}"))

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    real_admit = neardup_ingest.admit_batch
    calls = {"n": 0}

    def flaky_admit(spark_, batch_docs, state_dir, out_dir, batch_id):
        calls["n"] += 1
        if batch_id == 1 and calls["n"] <= 2:
            # crash AFTER the admitted write, BEFORE the state write
            # (worst case: visible output exists, state+checkpoint lost)
            table = neardup_ingest.ensure_index_table(spark_, state_dir)
            bd = batch_docs.select(*neardup_ingest.DOCS_STREAM_COLS)
            bp = neardup_ingest.postings_with_sizes(bd).localCheckpoint()
            sp = (
                spark_.table(table)
                .filter(F.col("batch_id") < batch_id)
                .select("doc_id", "shingle", "n")
            )
            dropped = neardup_ingest.dropped_doc_ids(bp, sp)
            adm = bd.join(dropped, bd.doc_id == dropped.d, "left_anti")
            from pathlib import Path as _P

            _P(out_dir).mkdir(parents=True, exist_ok=True)
            adm.select("doc_id").write.mode("overwrite").parquet(
                f"{out_dir}/admitted-b{batch_id}.parquet"
            )
            raise RuntimeError("injected mid-batch crash")
        return real_admit(spark_, batch_docs, state_dir, out_dir, batch_id)

    neardup_ingest.admit_batch = flaky_admit
    try:
        with pytest.raises(Exception):
            stream_neardup_ingest(spark, f"{src}/*", state, out, ckpt)
    finally:
        neardup_ingest.admit_batch = real_admit

    # restart with the same checkpoint: batch 1 replays, 2..3 proceed
    stream_neardup_ingest(spark, f"{src}/*", state, out, ckpt)
    got = sorted(r.doc_id for r in admitted_ids(spark, out).collect())
    assert got == _expected_admitted(spark, docs)
