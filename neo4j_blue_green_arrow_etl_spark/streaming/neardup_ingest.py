"""Streaming near-dup admission: exactly-once ingest that admits a
document only if it is not a near-duplicate (exact shingle Jaccard >=
JACCARD_THRESHOLD) of any EARLIER document — the continuous form of
operators.dedup.q_x44_incrdedup, and the shape a 100 TB pipeline runs
on its live crawl feed.

Design (r7: state is the BUCKETED index, not per-batch parquet globs):

- The dedup STATE is operators.dedup_index's persisted postings table:
  one external parquet table under ``state_dir``, CLUSTERED BY
  (shingle) INTO N BUCKETS and partitioned by batch_id, rows
  (doc_id, shingle, n). Nothing is held on the driver; across session
  restarts the deterministic DDL re-registers the same files.
- Each micro-batch runs the co-located probe join: batch postings vs
  ``batch_id < current`` partitions of the state table. The state
  side arrives at the shingle equi-join already hash-partitioned
  (Bucketed: true — the scan is the shuffle), so per-batch SHUFFLE
  cost is O(batch postings) regardless of how much state has
  accumulated; state contributes only a linear co-located scan. The
  r6 form re-shuffled the full glob-read state every batch — the
  worst scaling datapoint of that round (exponent ~0.95 with a 57.9 s
  x16 batch); this is the fix the q_x44 docstring promised.
- EXACTLY-ONCE: admitted ids keep the batchId-in-filename overwrite
  scheme (``admitted-b<id>.parquet``); state writes go through
  append_index_batch, whose dynamic partition overwrite replaces ONLY
  the replayed batch's partition. The ``batch_id < current`` read
  filter doubles as the exclusion of this batch's own partial prior
  attempt, so a replay re-derives identical admissions from immutable
  prior partitions — including after a crash BETWEEN the admitted
  write and the state write (tests/test_stream_ingest.py pins both
  orders).

Admission rule (deterministic, SQL-expressible — the q_st6_neardup
oracle): doc d is admitted iff NO doc e with order key (batch(e),
e.doc_id) < (batch(d), d.doc_id) has Jaccard(d, e) >= threshold. Note
"any earlier doc", not "any earlier ADMITTED doc": the greedy
admitted-only variant is order-recursive (not one SQL pass) and drops
fewer docs; near-dup chains collapse to their FIRST element either
way, which is what dedup pipelines keep. State therefore indexes
EVERY seen doc's postings, admitted or dropped.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup_index import (
    append_index_batch,
    ensure_index_table,
    postings_with_sizes,
    probe_match_pairs,
)

DOCS_STREAM_COLS = ("doc_id", "text")


def dropped_doc_ids(
    batch_post: DataFrame, state_post: DataFrame
) -> DataFrame:
    """doc_ids (column ``d``) of batch docs near-dup-matched by state
    postings or by an earlier (smaller doc_id) doc of the same batch.
    Both inputs carry (doc_id, shingle, n). One aggregation for both
    match sources (probe_match_pairs), and no distinct: the only
    consumer is a left_anti join, whose semantics ignore duplicate
    keys — a distinct here is a whole extra shuffle per micro-batch
    for nothing."""
    return probe_match_pairs(batch_post, state_post).select(
        F.col("doc_new").alias("d")
    )


def admit_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id: int,
    batch_post: DataFrame | None = None,
    batch_ids: DataFrame | None = None,
) -> None:
    """One exactly-once micro-batch: admit non-near-dup docs, write
    their doc_ids to ``out_dir`` (batchId-named file, replay
    overwrites) and this batch's postings to the bucketed state
    table's own ``batch_id`` partition (replay overwrites just that
    partition).

    ``batch_post`` (materialized (doc_id, shingle, n) for exactly
    ``batch_docs``) lets a BACKLOG driver precompute postings for
    queued batches concurrently: the postings build is stateless —
    only the PROBE needs prior batches' state — so in availableNow
    catch-up, where every queued file is already on disk, shingling
    batch k+1 while batch k's sinks run is free parallelism with
    identical per-batch semantics (q_st6_neardup does this).

    ``batch_ids`` (materialized one-column doc_id frame for exactly
    ``batch_docs``, r12): the admitted sink's anti-join otherwise
    re-evaluates ``batch_docs``' lineage per batch — for a fold whose
    batches are filters over a parquet scan that is a redundant scan
    per micro-batch (~0.5s each measured at sf0.1). Same catch-up
    precompute slot as batch_post; callers whose micro-batch frames are
    already in memory (the readStream shell) just omit it."""
    table = ensure_index_table(spark, state_dir)
    batch_docs = batch_docs.select(*DOCS_STREAM_COLS)
    if batch_post is None:
        # localCheckpoint: the postings feed three consumers (two match
        # joins + the state write); a checkpoint also cuts the
        # streaming source out of the reused plan
        batch_post = postings_with_sizes(batch_docs).localCheckpoint()
    # strictly-earlier state only: enforces arrival order AND excludes
    # this batch's own (possibly partial) prior attempt on replay —
    # partition-pruned on the full route, FILE-level filtered on the
    # bucket-pruned route (routed_state_postings applies
    # probe_dedup_index_auto's crossover policy when the state index is
    # wide enough for pruning to pay; the 32-bucket test fixtures skip
    # routing outright). Tombstoned (retracted) docs are masked out so
    # a takedown stops matching immediately, mid-stream (mask_deleted
    # is a no-op stat when no deletes exist).
    from ..operators.dedup_index import routed_state_postings

    state_post = routed_state_postings(
        spark, table, state_dir, batch_post, below_batch=batch_id
    )
    dropped = dropped_doc_ids(batch_post, state_post)
    # anti-join left side: the precomputed id frame when the caller
    # staged one (fold catch-up), else the batch frame itself — the
    # sink only emits doc_id, so the two are interchangeable (a doc
    # with no shingles appears in both and can never be dropped)
    left = batch_ids if batch_ids is not None else batch_docs
    admitted = left.join(dropped, left.doc_id == dropped.d, "left_anti")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    # The two sinks are INDEPENDENT (both consume the checkpointed
    # postings / the already-computed dropped set, neither reads the
    # other's output), so run them as concurrent Spark jobs — the
    # micro-batch's wall clock is max(write, write) instead of the
    # sum. Crash-wise the order never mattered: a replay re-derives
    # identical admissions whether the crash left the admitted file,
    # the state partition, both, or neither (the batch_id < current
    # read filter hides a partial state partition; both writes are
    # idempotent overwrites keyed by batch_id) — the ingest tests pin
    # both single-sided outcomes.
    # CONSTRAINT (ADVICE r8): append_index_batch's _insert_dynamic
    # flips spark.sql.sources.partitionOverwriteMode SESSION-WIDE for
    # its write's duration, and both pool tasks share this session —
    # safe ONLY because the admitted write is a NON-PARTITIONED path
    # write (partitionOverwriteMode is a no-op for it). Do not add a
    # partitioned write to this pool; serialize it instead, or it
    # nondeterministically inherits dynamic-overwrite mode.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        adm = pool.submit(
            lambda: admitted.select("doc_id")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/admitted-b{batch_id}.parquet")
        )
        st = pool.submit(
            append_index_batch, spark, table, batch_post, batch_id
        )
        adm.result()
        st.result()


def stream_neardup_ingest(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
) -> None:
    """Drain a documents file-stream (one file per micro-batch) through
    the near-dup admission pipeline with availableNow semantics.

    ``compact_every=k`` folds the state table's sealed partitions
    (ids < the batch about to run) every k batches — long-running
    ingest otherwise accrues one partition of ``buckets`` small files
    PER BATCH (dedup_index.compact_index). Compacting before the
    in-flight batch touches only ids the checkpoint has committed, so
    a replay can never target a folded partition; a replay OF the
    compaction itself is idempotent (same fold, rewritten)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id >= compact_every and batch_id % compact_every == 0:
            from ..operators.dedup_index import compact_index

            compact_index(spark, state_dir, batch_id - 1)
            # fold the sealed admitted record too (one tiny file per
            # batch otherwise accretes forever)
            compact_corpus_record(spark, out_dir, batch_id - 1)
        admit_batch(spark, batch_df, state_dir, out_dir, batch_id)

    q = (
        docs.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def admitted_ids(spark: SparkSession, out_dir: str) -> DataFrame:
    """Every admitted doc_id on record. Readers run FINISH-ONLY fold
    recovery (abort_incomplete=False): a committed-but-unfinished fold
    is completed, but an IN-FLIGHT fold's manifest/temp dir is left
    alone — so a reader racing a live stream's compact_corpus_record
    can never yank the writer's state mid-protocol (ADVICE r9; the
    abort path is the writer's, run at its own fold start). Reads
    concurrent with an ACTIVELY-folding writer are still best-effort —
    the writer may delete source files between this glob and the scan;
    reads of a crashed or idle record are exact."""
    _recover_record_fold(out_dir, abort_incomplete=False)
    files = sorted(Path(out_dir).glob("admitted-b*.parquet")) + sorted(
        Path(out_dir).glob("admitted-gen-*.parquet")
    )
    return spark.read.parquet(*[str(p) for p in files])


# --------------------------------------------------------------------------
# Corpus-record compaction: the out_dir twin of the state-table fold.
# A long-running ingest otherwise accretes one admitted file (and, on
# the retraction pipeline, one ledger file) PER BATCH forever — at
# production batch cadence that is millions of tiny files. Sealed
# per-batch files below a watermark fold into one generation file per
# prefix, with a manifest protocol so a crash in any window leaves the
# record readable and duplicate-free (same shape as
# dedup_index.compact_index):
#
#   write consolidated rows to a "."-prefixed temp dir (invisible)
#   -> write _RECORD_FOLD manifest {prefix, sources, gen}
#   -> rename the temp's part file to <prefix>-gen-<uuid>.parquet
#   -> delete the listed sources -> delete the manifest
#
# Recovery: manifest + gen present -> finish (delete sources,
# manifest); manifest present, gen absent -> the fold never committed.
# Only the WRITER (compact_corpus_record, at its own fold start) may
# ABORT that case (delete manifest + temp; sources intact): a READER
# racing a live writer cannot distinguish "crashed" from "in flight",
# so readers are FINISH-ONLY and leave an uncommitted fold untouched
# (ADVICE r9 — the old always-abort reader could delete a running
# writer's manifest mid-protocol and crash the stream). Only SEALED
# batches may fold (ids below the in-flight batch) — a replay can then
# never rewrite a folded source.
# --------------------------------------------------------------------------


def _record_manifest(out_dir: str) -> Path:
    return Path(out_dir, "_RECORD_FOLD")


def _recover_record_fold(out_dir: str, abort_incomplete: bool = True) -> None:
    import json
    import shutil

    manifest = _record_manifest(out_dir)
    if not manifest.exists():
        return
    try:
        meta = json.loads(manifest.read_text())
    except FileNotFoundError:
        # a concurrent finisher unlinked the manifest between exists()
        # and read — the fold it described is complete; nothing to do
        return
    gen = Path(out_dir, meta["gen"])
    if gen.exists():
        for s in meta["sources"]:
            _rm_record(Path(out_dir, s))
    elif not abort_incomplete:
        # reader path: the fold is uncommitted — in flight or crashed,
        # indistinguishable from here. Sources are intact either way;
        # read them and let the writer's own recovery clean up.
        return
    for p in Path(out_dir).glob(".tmpfold-*"):
        shutil.rmtree(p, ignore_errors=True)
    # missing_ok: a concurrent finisher may have unlinked it first
    manifest.unlink(missing_ok=True)


def _rm_record(p: Path) -> None:
    """Per-batch admitted records are Spark-written DIRECTORIES; ledger
    and generation records are flat pyarrow files — remove either."""
    import shutil

    if p.is_dir():
        shutil.rmtree(p, ignore_errors=True)
    else:
        p.unlink(missing_ok=True)


def compact_corpus_record(
    spark: SparkSession, out_dir: str, through_batch: int
) -> None:
    """Fold every sealed per-batch record file (batch id <=
    ``through_batch``) plus any prior generation into ONE generation
    file per prefix. Idempotent; callers pass a sealed watermark
    (below the in-flight batch id), exactly like compact_index."""
    import json
    import re
    import shutil
    import uuid

    _recover_record_fold(out_dir)
    out = Path(out_dir)
    # a crash between manifest temp-write and rename leaves a stray
    # temp; only the writer (here) may clear it
    for stray in out.glob(".tmpmanifest-*"):
        stray.unlink(missing_ok=True)
    for prefix in ("admitted", "retracted"):
        srcs = [
            p
            for p in out.glob(f"{prefix}-b*.parquet")
            if int(re.match(rf"{prefix}-b(\d+)", p.name).group(1))
            <= through_batch
        ] + list(out.glob(f"{prefix}-gen-*.parquet"))
        if len(srcs) <= 1:
            continue
        ids = spark.read.schema("doc_id BIGINT").parquet(
            *[str(p) for p in srcs]
        )
        tmpdir = out / f".tmpfold-{prefix}-{uuid.uuid4().hex}"
        ids.repartition(1).write.mode("overwrite").parquet(str(tmpdir))
        part = next(tmpdir.glob("part-*.parquet"))
        gen_name = f"{prefix}-gen-{uuid.uuid4().hex}.parquet"
        # temp + atomic rename (ADVICE r10): a plain write_text lets a
        # racing finish-only reader parse a partially-written manifest
        manifest = _record_manifest(out_dir)
        mtmp = out / f".tmpmanifest-{uuid.uuid4().hex}"
        mtmp.write_text(
            json.dumps(
                {"prefix": prefix, "sources": [p.name for p in srcs],
                 "gen": gen_name}
            )
        )
        mtmp.rename(manifest)
        part.rename(out / gen_name)
        for s in srcs:
            _rm_record(s)
        # missing_ok: once the gen rename lands, a concurrent reader's
        # finish-only recovery may legitimately complete the fold first
        _record_manifest(out_dir).unlink(missing_ok=True)
        shutil.rmtree(tmpdir, ignore_errors=True)
