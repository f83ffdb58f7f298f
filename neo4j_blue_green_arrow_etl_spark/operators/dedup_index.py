"""Persisted bucketed shingle index for incremental / streaming dedup.

q_x44_incrdedup's docstring argues that at rest the corpus shingle
table is the persistent index, and that bucketed by shingle the probe
join is co-located and shuffle-free on the corpus side. This module
makes that claim an ARTIFACT (VERDICT r6 task 1): a build/query pair
mirroring similarity.build_ivfpq_index / query_ivfpq_index, backed by
a parquet table ``CLUSTERED BY (shingle) INTO N BUCKETS`` and
partitioned by ``batch_id`` so incremental appends and crash replays
are per-partition overwrites.

Why bucketing is the right at-rest shape at 100 TB:

- The per-ingest probe join (today's batch postings vs the corpus
  index) requires both sides hash-partitioned on ``shingle``. A plain
  parquet corpus pays a FULL-CORPUS shuffle for that on every ingest
  — the dominant, ever-growing cost (SCALE_PROBE_NEWOPS_r6 measured
  q_st6's per-batch cost at exponent 0.95 in total state for exactly
  this reason). A bucketed corpus already IS hash-partitioned on
  disk: the scan reports ``Bucketed: true``, Catalyst drops the
  corpus-side Exchange, and only the (small) batch side shuffles —
  per-ingest shuffle cost becomes O(batch), with the corpus touched
  as a linear, spill-free, map-side scan.
  (tests/test_dedup_index.py pins the plan shape.)
- Postings rows are (doc_id, shingle, n): the per-doc shingle-set
  size ``n`` is DENORMALIZED onto every posting so the Jaccard
  verify needs no corpus-wide sizes aggregation (which would be a
  second full shuffle) — both set sizes ride along the candidate
  groupBy as ``first()`` aggregates.
- ``batch_id`` is a partition column: each ingest appends its own
  partition; a crash replay overwrites ONLY its partition (dynamic
  partition overwrite), so the exactly-once story of
  streaming/neardup_ingest.py carries over unchanged. Readers prune
  to ``batch_id < current`` for the any-earlier rule.
- The table is EXTERNAL (explicit LOCATION): the in-memory catalog
  forgets metadata across sessions, so ``ensure_index_table``
  re-issues the deterministic DDL + RECOVER PARTITIONS at startup —
  the data, being plain bucketed parquet, is the durable artifact.

Shingles are stored HASHED (xxhash64 -> BIGINT), like the minhash
tier: the index's bytes ARE the per-probe cost (every ingest scans it
once), and an 8-byte key column both shrinks the at-rest table ~4x vs
raw 3-gram strings and makes the equi-join compare longs instead of
strings. This matters on the measured path: the first r7 build stored
strings and its x32 probe LOST to full recompute (45.9s vs 31.9s,
SCALE_PROBE_INDEX_STRKEY_r7.json) because reading the exploded
string postings off disk out-costs re-shingling the raw text — the
shuffle the bucketing saves is the win at cluster scale, but the scan
bytes must not give it back. Measured regimes after the fix
(SCALING.md r7): fixed daily batch vs growing corpus — the regime the
index exists for — probe exponent 0.188 vs recompute's 0.385 (1.93s
vs 3.06s at x32 corpus); proportional growth (tagwords tree) — flat
to x32 with indexed/compacted ahead; batch-scales-with-corpus
duplicate-adversarial (suffix tree) — recompute ahead at x32, because
quadratic verify volume dominates and freshly shuffled in-memory
postings beat re-reading ANY at-rest layout. Correctness is
unaffected: hashing is row-wise over already-distinct (doc_id,
shingle) rows, so every Jaccard count is identical unless two
distinct 3-grams collide in 64 bits (expected collisions ~= s^2/2^65;
at 10^7 distinct shingles that is ~3e-6 — and the sf0.01 oracle gate
would surface one deterministically). q_x44b_incrdedup_indexed stays
fully oracle-gated against the SAME string-exact SQL as
q_x44_incrdedup — byte-identical results, different physical plan and
at-rest layout.

Reference parity: the reference has no dedup engine (it is a load
orchestrator); this family extends the training-data-pipeline
mission surface (SURVEY.md north-star extensions).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    INCR_MOD,
    JACCARD_THRESHOLD,
    _INCR_ORACLE,
    _incr_oracle,
    shingles,
)
from .relational import barrier_sort, register


def _docs(spark: SparkSession, sf_dir: str):
    """Plain documents read — deliberately NOT dedup._docs: the index
    queries derive several small frames from it per call (tiny probe
    batches, marker counts, rebuild corpora) and each consuming job
    would re-execute dedup._docs' rescue exchange; measured r12, the
    rescue cost the warm x44b-e probes +0.3-1.0s each while only the
    one-time rebuild branch would benefit."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")

# Bucket count of the at-rest index. Sized to the test harness
# (local[32]: one scan task per bucket); a production corpus would use
# O(10^3-10^4) buckets sized so each bucket's postings fit an executor
# core's working set. The count is baked into the table DDL — changing
# it means rebuilding the index (as with any bucketed layout).
DEDUP_INDEX_BUCKETS = 32

# at-rest layout version (goes into the default index path): v2 = the
# xxhash64 BIGINT shingle key (v1 stored raw 3-gram strings)
_SCHEMA_TAG = "i64v2"

_POSTINGS_COLS = ("doc_id", "shingle", "n")


def postings_with_sizes(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle, n) — distinct word 3-grams per doc with the
    doc's shingle-set size denormalized onto every row (one
    O(batch-postings) window shuffle at build time; saves the
    corpus-wide sizes aggregation on every subsequent probe).

    The window shuffle stays by MEASUREMENT: a map-only variant (n as
    F.size of the per-doc gram array before exploding) removes the
    shuffle but serializes the interpreted higher-order shingle
    expressions onto however few splits the input file has (a fixture
    corpus is ONE parquet split) and re-evaluates the array for the
    size column — 7.8 s vs 6.0 s on the 4-batch st6 harness, with the
    repartition-first rescue measuring worse still (14 s). The
    shuffle here is the same O(batch) cost the ingest design already
    budgets for the probe side."""
    from pyspark.sql import Window

    sh = shingles(docs)
    # hash AFTER the per-doc distinct (row-wise, count-preserving);
    # see module docstring for the collision/size argument
    return sh.select(
        "doc_id",
        F.xxhash64("shingle").alias("shingle"),
        F.count("*")
        .over(Window.partitionBy("doc_id"))
        .cast("int")
        .alias("n"),
    )


def index_table_name(index_path: str) -> str:
    """Deterministic catalog name for the index at ``index_path`` —
    unique per location so concurrent indexes (different sf_dirs,
    different stream state dirs) never collide in the shared session
    catalog."""
    digest = hashlib.md5(str(index_path).encode()).hexdigest()[:12]
    return f"dedup_shingle_index_{digest}"


# ensure_index_table results — (table_name, bucket_width) keyed by
# (applicationId, index_path): the DDL + RECOVER PARTITIONS + REFRESH
# round-trips are idempotent metadata ops, but RECOVER launches a
# listing job (~0.3 s of job floor) — paid ONCE per session per index,
# not once per micro-batch. (r7's per-batch ensure was the round's one
# perf weak: q_st6_neardup 3.4->7.9 s from 4x repeated catalog
# round-trips.) The width rides in the cache value so an explicit
# ``buckets`` argument is validated on cache HITS too (ADVICE r8: the
# hit path previously returned before the mismatch check). A process
# restart starts with an empty dict, so the re-registration contract
# is unchanged; tests simulating restarts clear this cache.
_ENSURED: dict[tuple[str, str], tuple[str, int]] = {}

# sidecar recording the bucket count the index was BUILT with ("_"
# prefix: invisible to scans). The DDL count otherwise lives only in
# the creating caller's head — a path-reading prober that guessed a
# different count would compute wrong pmod bucket ids and silently
# drop most part files (false negatives, no error).
_BUCKETS_FILE = "_BUCKETS"


def index_bucket_count(index_path: str) -> int:
    """Bucket count persisted at index creation (``_BUCKETS``
    sidecar). Raises for an index that was never ensured — pruned
    probes must not guess."""
    sidecar = Path(index_path, _BUCKETS_FILE)
    if not sidecar.exists():
        raise ValueError(
            f"no {_BUCKETS_FILE} sidecar under {index_path}: the index "
            "was not created by ensure_index_table (or predates the "
            "sidecar); rebuild it rather than guessing a bucket count"
        )
    return int(sidecar.read_text())


def ensure_index_table(
    spark: SparkSession,
    index_path: str,
    buckets: int | None = None,
) -> str:
    """Idempotently (re-)register the external bucketed postings table
    over ``index_path`` and recover any partitions already on disk.
    Returns the catalog table name.

    ``buckets``: the width to CREATE a brand-new index with (defaults
    to DEDUP_INDEX_BUCKETS); for an existing index it is VALIDATED
    against the persisted ``_BUCKETS`` sidecar — on cache hits too —
    never trusted. A directory that already holds part files but lost
    its sidecar raises and demands reset_index: backfilling the
    sidecar from the caller's argument would let index_bucket_count
    confidently report a wrong width, and the pruned probe would then
    silently drop part files (ADVICE r8 — the exact false-negative
    mode the sidecar exists to prevent; the width cannot be derived
    from file names either, since observed bucket ids only bound it
    from below).

    Needed on every fresh session: the in-memory catalog holds no
    metadata across processes, but the DDL is deterministic and the
    bucketed parquet files on disk are self-describing (bucket id is
    encoded in the file name), so re-registration is metadata-only —
    and cached per (session, path), so per-micro-batch calls cost one
    dict hit plus one manifest stat. Interrupted-compaction recovery
    still runs on EVERY call (a within-session stream restart must
    not read a half-folded table), but it is a single file-exists
    check unless a manifest is actually pending."""
    key = (spark.sparkContext.applicationId, str(index_path))
    cached = _ENSURED.get(key)
    if cached is not None:
        table, width = cached
        if buckets is not None and buckets != width:
            raise ValueError(
                f"index at {index_path} was built with {width} "
                f"buckets; ensure_index_table called with {buckets}"
            )
    else:
        table = index_table_name(index_path)
        fresh = not Path(index_path).exists()
        Path(index_path).mkdir(parents=True, exist_ok=True)
        sidecar = Path(index_path, _BUCKETS_FILE)
        if sidecar.exists():
            width = int(sidecar.read_text())
            if buckets is not None and width != buckets:
                raise ValueError(
                    f"index at {index_path} was built with {width} "
                    f"buckets; ensure_index_table called with {buckets}"
                )
        elif next(Path(index_path).glob("batch_id=*/part-*"), None) is not None:
            raise ValueError(
                f"index at {index_path} holds part files but no "
                f"{_BUCKETS_FILE} sidecar (pre-sidecar build or lost "
                "sidecar): its true bucket width is unknowable — "
                "reset_index and rebuild rather than guessing"
            )
        else:
            width = buckets if buckets is not None else DEDUP_INDEX_BUCKETS
            sidecar.write_text(str(width))
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} "
            "(doc_id BIGINT, shingle BIGINT, n INT, batch_id INT) "
            "USING parquet PARTITIONED BY (batch_id) "
            f"CLUSTERED BY (shingle) SORTED BY (shingle) "
            f"INTO {width} BUCKETS "
            f"LOCATION '{index_path}'"
        )
        if not fresh:
            # files may exist / have changed under an
            # already-registered name (another process appended a
            # batch): discover partitions, drop stale listings. A
            # BRAND-NEW directory has neither partitions nor stale
            # metadata — skip both catalog jobs (a fresh stream state
            # dir would otherwise pay them for nothing).
            spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
            spark.sql(f"REFRESH TABLE {table}")
        _ENSURED[key] = (table, width)
    # a compaction interrupted mid-protocol leaves a manifest; finish
    # (or abort) it BEFORE handing the table to readers, so no caller
    # ever observes folded rows alongside their source partitions
    _recover_compaction(spark, table, index_path)
    return table


def append_index_batch(
    spark: SparkSession,
    table: str,
    postings: DataFrame,
    batch_id: int,
) -> None:
    """Write one batch's postings into its own ``batch_id`` partition,
    bucketed by shingle. Dynamic partition overwrite makes a crash
    REPLAY overwrite only this batch's partition — prior batches'
    files are immutable, so the replay re-derives identical rows from
    identical inputs (the exactly-once contract of
    streaming/neardup_ingest.py, now at the table layer)."""
    out = postings.select(*_POSTINGS_COLS).withColumn(
        "batch_id", F.lit(batch_id)
    )
    _insert_dynamic(out, table)
    # no REFRESH here: InsertIntoHadoopFsRelationCommand already
    # refreshes the target's relation cache as part of its commit, and
    # cross-session writers (foreachBatch clones) go through the SAME
    # shared partition catalog — verified by the streaming replay and
    # convergence tests, which read each batch's state on the outer
    # session right after the clone's insert. Dropping it halves the
    # per-micro-batch catalog round-trips (the r7 q_st6 perf weak).


def _insert_dynamic(out: DataFrame, table: str) -> None:
    """insertInto(table) with dynamic partition overwrite, set on the
    DATAFRAME'S OWN session. Two sharp edges force this shape: the
    DataFrameWriter option('partitionOverwriteMode',...) is ignored by
    catalog-table insertInto (only path writes honor it), and inside
    foreachBatch the batch DataFrame is bound to a CLONED session —
    setting the conf on the outer session leaves the clone in static
    mode, where a partition overwrite TRUNCATES THE WHOLE TABLE
    (observed: the stream's last append erased all prior state).
    insertInto resolves positionally: ``out`` columns must match the
    DDL (doc_id, shingle, n, batch_id) exactly."""
    sess = out.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = sess.conf.get(key, "STATIC")
    sess.conf.set(key, "dynamic")
    try:
        out.write.mode("overwrite").insertInto(table)
    finally:
        sess.conf.set(key, prev)


# ---------------------------------------------------------------------------
# Compaction: fold sealed batch partitions into one
# ---------------------------------------------------------------------------
#
# Every ingest appends one partition holding `buckets` files, so after
# B ingests each bucket's postings are smeared over B small files —
# the classic small-files decay: listing cost grows O(B x buckets),
# scan tasks lose locality, and the per-file SORTED BY order stops
# covering the bucket (why the probe join needs SHUFFLE_HASH instead
# of a sort-merge). Compaction rewrites all SEALED batches (ids <=
# a watermark the stream will never replay) into ONE partition with
# one file per bucket, restoring O(buckets) files without touching
# the exactly-once story of the live tail.
#
# Crash protocol (no metastore transactions over plain parquet, so
# recovery is made DETERMINISTIC instead of the swap atomic):
#   1. manifest {"through": w, "target": t, "rows": n} written to the
#      index root, where t is a FRESH fold-generation id (negative,
#      below every existing partition id) that has never held live
#      data — so no step ever overwrites a partition readers depend on
#   2. consolidated rows (all batch_id <= w, relabeled t) committed to
#      partition t via dynamic-overwrite insertInto (per-partition
#      staging + rename)
#   3. source partition DIRECTORIES (batch_id <= w, != t) deleted —
#      including any previous fold generations (the table is EXTERNAL:
#      DROP PARTITION alone would leave files for a later RECOVER
#      PARTITIONS to resurrect)
#   4. manifest removed
# ensure_index_table() runs _recover_compaction() on every open: a
# manifest with partition t's row count == n means step 2 committed —
# finish steps 3-4; any other state means it did not — abort by
# deleting whatever landed in t (never live data, by construction)
# and removing the manifest (source partitions are still intact).
# Why t is never `through_batch` itself: dynamic overwrite's job
# commit DELETES the existing partition dir before moving staged files
# in, so folding INTO a live source partition has a window where a
# crash loses that partition's original rows with nothing committed
# yet — recovery would then "abort" cleanly while batch w's data is
# simply gone. A fresh negative id has no such window. Fold ids stay
# below every live id, so ``batch_id < current`` probe filters and
# ``batch_id <= through`` fold scans include them transparently.

_COMPACT_MANIFEST = "_COMPACT_MANIFEST"  # "_"-prefix: invisible to scans


def _next_fold_id(index_path: str) -> int:
    """A partition id strictly below every id present on disk (and
    below 0, the smallest live batch id): the fold target that is
    guaranteed never to have held data a reader could be depending
    on."""
    ids = [
        int(p.name.split("=", 1)[1])
        for p in Path(index_path).glob("batch_id=*")
    ]
    return min([0, *ids]) - 1


def compact_index(
    spark: SparkSession, index_path: str, through_batch: int
) -> None:
    """Fold every partition with ``batch_id <= through_batch``
    (previous fold generations included) into ONE fresh fold
    partition. The caller must only pass a SEALED watermark (a batch
    id the stream can never replay — in streaming/neardup_ingest.py,
    anything below the batch currently being processed): replaying a
    folded batch would recreate its partition alongside its rows in
    the fold. Idempotent — compacting an already-compacted range
    rewrites the same rows into the next generation."""
    import json

    table = ensure_index_table(spark, index_path)  # finishes pending folds
    target = _next_fold_id(index_path)
    src = spark.table(table).filter(F.col("batch_id") <= through_batch)
    # Snapshot the tombstone FILE LIST before the fold's mask reads the
    # sidecar: retirement below may only touch files the fold PROVABLY
    # applied. A tombstone appended by a concurrent session after this
    # point may or may not be masked into the fold (the mask plan reads
    # the dir slightly later) — either way it survives retirement and
    # keeps masking, which is the safe side (ADVICE r9: the old
    # dir-listing-at-retirement form could delete such a tombstone
    # while its doc's rows lived on in the fold generation).
    tomb_snapshot = _tombstone_files(index_path)
    # tombstoned docs are PHYSICALLY dropped here: the fold rows are
    # computed masked, so the manifest's row count already reflects the
    # deletion and the crash protocol is byte-identical to the
    # undeleted case (recovery never needs to know deletes happened)
    src = mask_deleted(spark, src, index_path)
    # localCheckpoint breaks lineage: the write below mutates the
    # directory tree this plan reads. A compaction necessarily
    # rewrites its bytes somewhere; block storage here plays the
    # staging-dir role a cluster FS would.
    consolidated = (
        src.select(*_POSTINGS_COLS)
        .withColumn("batch_id", F.lit(target))
        .localCheckpoint()
    )
    n = consolidated.count()
    manifest = Path(index_path, _COMPACT_MANIFEST)
    manifest.write_text(
        json.dumps({"through": through_batch, "target": target, "rows": n})
    )
    _insert_dynamic(consolidated, table)
    spark.sql(f"REFRESH TABLE {table}")
    _recover_compaction(spark, table, index_path)
    consolidated.unpersist()
    _retire_applied_tombstones(
        spark, table, index_path, through_batch, tomb_snapshot
    )


def _tombstone_files(index_path: str) -> list[Path]:
    """The tombstone sidecar's data files right now (flat batch-tagged
    and plain-append parquet files; "_"/"."-prefixed bookkeeping
    skipped). compact_index snapshots this BEFORE its masked fold so
    retirement can be scoped to files the fold provably applied."""
    tomb_dir = Path(index_path, _TOMBSTONES_DIR)
    if not tomb_dir.exists():
        return []
    return [
        p for p in tomb_dir.iterdir() if not p.name.startswith(("_", "."))
    ]


def _retire_applied_tombstones(
    spark: SparkSession,
    table: str,
    index_path: str,
    through_batch: int,
    snapshot: list[Path],
) -> None:
    """Drop tombstones the fold just PHYSICALLY APPLIED, so the mask's
    broadcast set stays bounded on an infinite stream instead of
    accreting one row per takedown forever (the SCALING.md trade-off
    this closes: before, the fold cadence only reclaimed DATA space,
    never sidecar space).

    SCOPE = ``snapshot``: only tombstone files that existed BEFORE the
    fold read its mask are candidates — those the fold provably
    applied. A tombstone appended by a concurrent session during or
    after the fold is left untouched even though its doc's rows may
    have survived into the fold generation (where the tail filter
    below would miss them); it keeps masking and retires at the next
    fold (ADVICE r9). This is what makes delete_from_index's
    concurrent-append claim true.

    A snapshot tombstone is applied iff its doc has no rows left
    anywhere: ids are never reused, a doc's postings live only in its
    ingest batch's partition, and the fold was computed masked — so
    after folding through T, only tombstones targeting docs in
    partitions > T can still mask anything. Keep = snapshot tombstones
    semi-joined against the unfolded tail (one scan of the few recent
    partitions; in the streaming cadence the tail is empty and
    everything retires).

    CRASH-SAFE BY MONOTONICITY, no new protocol: the kept set is
    written first (atomic tmp+rename, skipped when empty), then the
    superseded files are deleted. A crash anywhere leaves
    kept ∪ old = old — over-masking only by ids that mask nothing
    (they have no rows, by the rule above). Sealed batch-tagged files
    are safe to delete because their batches can never replay (the
    fold watermark is below the in-flight batch, and the in-flight
    batch's tombstones are written AFTER the fold in every stream
    driver). When retirement empties the sidecar entirely, the dir
    itself is removed so probes regain the no-delete fast path."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    import shutil

    tomb_dir = Path(index_path, _TOMBSTONES_DIR)
    old = [p for p in snapshot if p.exists()]
    if not old:
        return
    tomb = spark.read.schema("doc_id BIGINT").parquet(*[str(p) for p in old])
    tail = spark.table(table).filter(F.col("batch_id") > through_batch)
    kept = [
        r[0]
        for r in tomb.join(
            tail.select("doc_id").distinct(), "doc_id", "left_semi"
        ).collect()
    ]
    if kept:
        gen = pa.table({"doc_id": pa.array(sorted(kept), type=pa.int64())})
        tmp = tomb_dir / f".tmp-{uuid.uuid4().hex}.parquet"
        pq.write_table(gen, tmp)
        tmp.rename(tomb_dir / f"applied-gen-{uuid.uuid4().hex}.parquet")
    for p in old:
        if p.is_dir():
            shutil.rmtree(p, ignore_errors=True)
        else:
            p.unlink(missing_ok=True)
    try:
        # only succeeds when truly empty (no concurrent appends, no
        # kept gen) — restores the tomb_dir.exists() no-delete fast path
        tomb_dir.rmdir()
    except OSError:
        pass


def _recover_compaction(
    spark: SparkSession, table: str, index_path: str
) -> None:
    """Finish (or abort) an interrupted compaction — see protocol
    above. Local-FS directory ops here; a cluster deployment swaps in
    the Hadoop FileSystem API, the protocol is unchanged."""
    import json
    import shutil

    manifest = Path(index_path, _COMPACT_MANIFEST)
    if not manifest.exists():
        return
    meta = json.loads(manifest.read_text())
    w, t, n = int(meta["through"]), int(meta["target"]), int(meta["rows"])
    spark.sql(f"REFRESH TABLE {table}")
    committed = (
        spark.table(table).filter(F.col("batch_id") == t).count() == n
    )

    def _drop_partition(part: Path, pid: int) -> None:
        shutil.rmtree(part)
        # the table is EXTERNAL so this is metadata-only (the files
        # are already gone); RECOVER only ADDS partitions and would
        # leave a dangling catalog entry otherwise
        spark.sql(
            f"ALTER TABLE {table} DROP IF EXISTS "
            f"PARTITION (batch_id={pid})"
        )

    for part in Path(index_path).glob("batch_id=*"):
        pid = int(part.name.split("=", 1)[1])
        if committed:
            if pid <= w and pid != t:
                _drop_partition(part, pid)  # finish: remove sources
        elif pid == t:
            # abort: t never held live data — whatever the crashed
            # job left there is safe to discard
            _drop_partition(part, pid)
    spark.sql(f"REFRESH TABLE {table}")
    manifest.unlink()


# ---------------------------------------------------------------------------
# Tombstone deletes: retract documents from the at-rest index
# ---------------------------------------------------------------------------
#
# A real corpus retracts documents (re-crawls, takedowns, contested
# content); the reference's retention analogue drops whole DATABASES
# (reference orchestrator.py:386-424, covered by the catalog family) —
# per-ROW deletion is the pipeline-side extension. Plain parquet has no
# row deletes, so the standard LSM move applies: deletes are TOMBSTONE
# rows in an append-only ``_TOMBSTONES/`` sidecar dir ("_" prefix:
# invisible to table scans), MASKED out of every probe with a broadcast
# anti-join on doc_id (no extra exchange — the state side's co-located
# bucketed scan is preserved), and PHYSICALLY dropped by the existing
# manifest-recoverable compaction fold (the consolidated rows are
# computed tombstone-masked, so the crash protocol needs no new steps:
# the fold count ``n`` already reflects the masked rows, and recovery
# is byte-identical to the undeleted case).
#
# Contract: a deleted doc_id must not be re-ingested — ids are never
# reused in this design (content-addressed / monotonically assigned);
# re-using an id anyway requires reset_index + rebuild. A tombstone a
# fold has fully applied masks nothing — and compact_index RETIRES it
# (_retire_applied_tombstones) so the mask's broadcast set stays
# bounded on an infinite stream. Retirement is scoped to the tombstone
# files SNAPSHOTTED before the fold read its mask (so a concurrent
# session's delete appended mid-fold is never retired unapplied) and is
# crash-safe by MONOTONICITY, not a protocol: the kept set is written
# before the superseded files are deleted, and kept ∪ old = old
# (retired ids have no rows left, so over-masking on a crash changes
# nothing). Streaming
# consumers that need the PERMANENT takedown record (live_corpus)
# keep their own sealed ledger (retract_ingest._write_retract_ledger)
# — the sidecar is only the mask.

_TOMBSTONES_DIR = "_TOMBSTONES"

# DataFrame-argument deletes above this many ids are written as a
# DISTRIBUTED single-file parquet job instead of collect()+pyarrow: a
# routine takedown batch is tiny (driver-side pyarrow, ~10 ms beats a
# Spark job's fixed ~0.5 s), but a bulk GDPR-style purge of 10^8 ids
# must never materialize the id list on the driver (VERDICT r9 item 2).
TOMBSTONE_COLLECT_MAX = 1_000_000


def _write_tombstone_file_distributed(
    ids_df: DataFrame, tomb_dir: Path, name: str, id_col: str
) -> None:
    """Write ``ids_df`` as ONE parquet file named ``name`` inside the
    flat sidecar WITHOUT driver materialization: repartition(1) job to
    a "."-prefixed temp dir (invisible to Spark's FileIndex even if
    orphaned), then an atomic same-directory rename of its part file.
    repartition(1), not coalesce(1): coalesce folds every parent
    partition's work into one task (measured ~4.7 s for a local
    relation); repartition keeps the upstream parallel and shuffles
    into one writer."""
    import shutil
    import uuid

    tmpdir = tomb_dir / f".tmpdel-{uuid.uuid4().hex}"
    (
        ids_df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(1)
        .write.mode("overwrite")
        .parquet(str(tmpdir))
    )
    part = next(tmpdir.glob("part-*.parquet"))
    part.rename(tomb_dir / name)
    shutil.rmtree(tmpdir, ignore_errors=True)


def delete_from_index(
    spark: SparkSession, index_path: str, doc_ids, batch_tag: int | None = None
) -> None:
    """Tombstone-delete documents from the index at ``index_path``.

    ``doc_ids``: an iterable of ids or a DataFrame with a ``doc_id``
    column. Appends one flat parquet file of tombstone rows (atomic
    temp+rename), and appends from concurrent sessions compose because
    files are independent — including with a concurrently-running
    compact_index, whose retirement pass only ever touches files it
    snapshotted BEFORE its fold read the mask
    (_retire_applied_tombstones). Effective immediately for every
    probe (masking reads the sidecar dir at plan time); space is
    reclaimed by the next compact_index fold.

    ``batch_tag`` makes the delete EXACTLY-ONCE for a streaming
    micro-batch: the rows land in a flat file named by the tag
    (``_TOMBSTONES/batch-<tag>.parquet``), so a foreachBatch replay
    atomically REPLACES the same file instead of appending a second
    copy (streaming/retract_ingest.py). Plain appends and tagged files
    coexist — the mask reads every data file in the flat sidecar dir.

    The write is DRIVER-SIDE pyarrow for routine takedown batches, not
    a Spark job: the tombstone sidecar is bookkeeping metadata of the
    same class as the _BUCKETS sidecar and the compaction manifests. A
    Spark write here measured 0.5-5 s of pure job overhead PER
    MICRO-BATCH on the streaming retract path; pyarrow is ~10 ms.
    BOUNDED (VERDICT r9, single-evaluation per ADVICE r10): a
    DataFrame argument is probed ONCE with limit(MAX+1).collect();
    <= TOMBSTONE_COLLECT_MAX ids and the probe IS the id list, above
    it the file is written by a distributed single-partition Spark
    job instead — a bulk GDPR-style purge never materializes its id
    list on the driver, and a routine delete runs its source plan
    exactly once.
    Atomicity either way: write to a "."-prefixed temp (Spark's
    FileIndex ignores it even if orphaned by a crash) then an atomic
    same-directory rename."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    tomb_dir = Path(index_path, _TOMBSTONES_DIR)
    tomb_dir.mkdir(parents=True, exist_ok=True)
    name = (
        f"batch-{batch_tag}.parquet"
        if batch_tag is not None
        else f"tomb-{uuid.uuid4().hex}.parquet"
    )
    if isinstance(doc_ids, DataFrame):
        # Evaluate ONCE (ADVICE r10): a separate count() + collect()
        # runs the source plan twice — a routine delete pays double,
        # and a non-deterministic source could yield a different id
        # set than was counted. One limit(MAX+1) probe both routes and
        # (on the small path) IS the materialized id list; the big
        # path's distributed write is itself a single evaluation.
        probe = [
            r[0]
            for r in doc_ids.select(F.col("doc_id").cast("long"))
            .limit(TOMBSTONE_COLLECT_MAX + 1)
            .collect()
        ]
        if len(probe) > TOMBSTONE_COLLECT_MAX:
            _write_tombstone_file_distributed(
                doc_ids, tomb_dir, name, "doc_id"
            )
            return
        ids = probe
    else:
        ids = [int(d) for d in doc_ids]
    table = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    tmp = tomb_dir / f".tmp-{uuid.uuid4().hex}.parquet"
    pq.write_table(table, tmp)
    tmp.rename(tomb_dir / name)


def _tombstones(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Tombstoned doc_ids, or None when the index has never seen a
    delete (the fast path: one directory stat, no plan overhead —
    restored by retirement when the last tombstone is applied). The
    sidecar is FLAT: plain appends (tomb-*.parquet), batch-tagged
    exactly-once files (batch-<id>.parquet, atomic replace on replay)
    and retirement generations (applied-gen-*.parquet) all live as
    sibling files; Spark's FileIndex skips "_"/"."-prefixed
    bookkeeping files."""
    tomb_dir = Path(index_path, _TOMBSTONES_DIR)
    if not tomb_dir.exists():
        return None
    return spark.read.schema("doc_id BIGINT").parquet(str(tomb_dir))


def mask_deleted(
    spark: SparkSession, postings: DataFrame, index_path: str
) -> DataFrame:
    """Drop tombstoned docs' postings. Broadcast anti-join on doc_id:
    the deleted set is small by nature (takedowns, not re-ingests), so
    the mask adds no exchange and the state side's co-located bucketed
    scan survives underneath it."""
    tomb = _tombstones(spark, index_path)
    if tomb is None:
        return postings
    return postings.join(F.broadcast(tomb), "doc_id", "left_anti")


def _candidate_rows(
    x_post: DataFrame,
    y_post: DataFrame,
    pair_filter: Column | None = None,
) -> DataFrame:
    """(d, e, na, nb) — one row per SHARED SHINGLE between an x doc
    and a y doc: the pre-aggregation candidate stream of the probe
    join. Both inputs carry (doc_id, shingle, n); only docs sharing
    >= 1 shingle ever meet (no cartesian); ``pair_filter`` adds a
    post-join predicate on the aliased sides (e.g. id-order for
    intra-batch matching).

    The probe side carries a SHUFFLE_HASH hint: without it Catalyst
    picks sort-merge, and because an incrementally-grown bucket holds
    one file PER BATCH, Spark cannot trust the per-file sort order —
    so SMJ re-SORTS the ENTIRE accumulated state on every probe,
    which measured SLOWER at x16 than recomputing the postings from
    raw text (SCALE_PROBE_INDEX_r7, smj variant). Hash-building the
    small probe side instead streams the state buckets with no sort
    and no shuffle — the per-probe state cost is one linear co-located
    scan, full stop."""
    x = x_post.hint("shuffle_hash").alias("x")
    y = y_post.alias("y")
    joined = x.join(y, F.col("x.shingle") == F.col("y.shingle"))
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    return joined.select(
        F.col("x.doc_id").alias("d"),
        F.col("y.doc_id").alias("e"),
        F.col("x.n").alias("na"),
        F.col("y.n").alias("nb"),
    )


def _pairs_from_candidates(cand: DataFrame) -> DataFrame:
    """(d, e, jaccard) from a candidate stream: ONE groupBy (d, e) —
    set sizes ride along as first() aggregates — then the exact
    Jaccard filter."""
    common = cand.groupBy("d", "e").agg(
        F.count("*").alias("c"),
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return common.filter(jac >= JACCARD_THRESHOLD).select(
        "d", "e", F.round(jac, 4).alias("jaccard")
    )


def neardup_match_pairs(
    x_post: DataFrame,
    y_post: DataFrame,
    pair_filter: Column | None = None,
) -> DataFrame:
    """(d, e, jaccard) — probe-side docs ``d`` (from x_post) matched to
    ``e`` (from y_post) at exact shingle Jaccard >= JACCARD_THRESHOLD.
    See _candidate_rows for the join shape (state side co-located,
    SHUFFLE_HASH on the probe side)."""
    return _pairs_from_candidates(_candidate_rows(x_post, y_post, pair_filter))


def probe_match_pairs(
    batch_post: DataFrame, state_post: DataFrame
) -> DataFrame:
    """(doc_new, doc_match, jaccard) — the standard incremental-dedup
    probe: batch docs matched against the state AND against earlier
    (smaller doc_id) docs of their own batch, through a SINGLE
    aggregation.

    The two candidate streams are unioned BEFORE the (d, e) groupBy —
    one shuffle+agg instead of two (r7 ran a groupBy per join; on a
    4-micro-batch stream that was 8 extra stages of pure fixed cost).
    Safe because every caller's state and batch doc sets are DISJOINT
    (state is `batch_id < current` / `doc_id % mod != 0`, the batch is
    its complement), so a (d, e) group can only ever receive rows from
    ONE of the two joins — the merged counts are each join's own. The
    per-join physical shapes are preserved: union happens above the
    joins, so the state side still scans co-located (Bucketed: true)
    and only batch postings shuffle."""
    cand = _candidate_rows(batch_post, state_post).unionByName(
        _candidate_rows(
            batch_post,
            batch_post,
            pair_filter=F.col("y.doc_id") < F.col("x.doc_id"),
        )
    )
    return _pairs_from_candidates(cand).select(
        F.col("d").alias("doc_new"),
        F.col("e").alias("doc_match"),
        "jaccard",
    )


# ---------------------------------------------------------------------------
# Corpus index build + probe (the q_x44 pattern, at rest)
# ---------------------------------------------------------------------------


def build_dedup_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> str:
    """Materialize the CORPUS-side shingle index for incremental dedup
    at rest: postings of every already-indexed doc (q_x44's convention:
    doc_id % INCR_MOD != 0; the complement stands in for the incoming
    batch) as one bucketed batch_id=0 partition. Idempotent — a
    rebuild overwrites the same partition. Returns the table name."""
    table = ensure_index_table(spark, index_path)
    corpus = _docs(spark, sf_dir).filter(F.col("doc_id") % INCR_MOD != 0)
    append_index_batch(spark, table, postings_with_sizes(corpus), 0)
    return table


def probe_dedup_index(
    spark: SparkSession,
    batch_docs: DataFrame,
    table: str,
    index_path: str | None = None,
) -> DataFrame:
    """(doc_new, doc_match, jaccard) — the incoming batch probed
    against the at-rest index AND against earlier (smaller doc_id)
    docs of its own batch: exactly q_x44_incrdedup's semantics with
    the corpus side read from the bucketed table instead of
    recomputed. Per-probe shuffle cost is O(batch): the index scan is
    co-located (Bucketed: true, no Exchange — pinned by
    tests/test_dedup_index.py). ``index_path``, when given, applies
    the tombstone mask (mask_deleted) to the state side — retracted
    docs never match.

    PRECONDITION: the batch's doc_ids must be DISJOINT from the
    index's (the ingest contract — every doc is indexed once).
    probe_match_pairs fuses the vs-state and vs-batch candidate
    streams into one aggregation on that assumption; an overlapping
    probe would silently merge the two joins' counts and inflate
    Jaccard (tests/test_dedup_index.py asserts the fixture's
    disjointness)."""
    batch_post = postings_with_sizes(
        batch_docs.select("doc_id", "text")
    ).localCheckpoint()  # small; read by both joins below
    state = spark.table(table).select(*_POSTINGS_COLS)
    if index_path is not None:
        state = mask_deleted(spark, state, index_path)
    return probe_match_pairs(batch_post, state)


def _touched_buckets(batch_post: DataFrame, buckets: int) -> set[int]:
    """Bucket ids the batch's shingles hash into — <= ``buckets`` ints
    of driver traffic, by construction. pmod(F.hash(shingle), N) IS
    the bucketed writer's Murmur3 placement, pinned by
    tests/test_dedup_index.py::test_file_hash_matches_bucket_id."""
    return {
        r[0]
        for r in batch_post.select(
            F.pmod(F.hash("shingle"), F.lit(buckets)).alias("b")
        )
        .distinct()
        .collect()
    }


def _probe_pruned(
    spark: SparkSession,
    batch_post: DataFrame,
    index_path: str,
    touched: set[int],
    below_batch: int | None = None,
) -> DataFrame:
    """The pruned-probe core: path-read ONLY the part files whose
    bucket id is in ``touched``, then the standard fused probe.
    Callers must have run ensure_index_table first (pending-compaction
    recovery — a half-folded tree would otherwise double-count
    postings and inflate Jaccard). ``below_batch`` additionally drops
    files whose partition id is >= that batch — the FILE-level form of
    the streaming admit path's ``batch_id < current`` read filter
    (fold generations are negative, hence always included: they only
    ever hold sealed batches below any live id)."""
    state = _pruned_state(spark, index_path, touched, below_batch)
    return probe_match_pairs(batch_post, state)


def _pruned_state(
    spark: SparkSession,
    index_path: str,
    touched: set[int],
    below_batch: int | None = None,
) -> DataFrame:
    """Tombstone-masked state postings path-read from ONLY the touched
    buckets' part files (see _probe_pruned for the contract)."""
    files = [
        str(f)
        for f in Path(index_path).glob("batch_id=*/part-*")
        if _bucket_of(f.name) in touched
        and (
            below_batch is None
            or int(f.parent.name.split("=", 1)[1]) < below_batch
        )
    ]
    state = (
        spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT")
        .parquet(*files)
        if files
        else spark.createDataFrame(
            [], "doc_id BIGINT, shingle BIGINT, n INT"
        )
    )
    return mask_deleted(spark, state, index_path)


def probe_dedup_index_pruned(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_path: str,
    buckets: int | None = None,
) -> DataFrame:
    """probe_dedup_index with BUCKET-FILE PRUNING: read only the index
    buckets the batch's shingles hash into, instead of scanning the
    whole table.

    Why it exists: the co-located probe join still SCANS the full
    corpus index linearly (SCALE_PROBE_FIXEDBATCH_r7 measures that
    slope). On a production index with O(10^3-10^4) buckets, a small
    daily batch's distinct shingles hash into a SUBSET of buckets —
    file-level pruning makes the per-ingest scan O(touched buckets),
    not O(corpus). Spark has no dynamic bucket pruning (only literal
    predicates prune buckets), so this composes it manually: collect
    the batch's touched-bucket set, then read only those part files.
    The trade: path-read postings lose the catalog's bucketing
    metadata, so the join shuffles BOTH sides — right when batch <<
    corpus, shuffling two small slices beats map-scanning the whole
    table; when the batch touches most buckets, use
    probe_dedup_index's co-located scan (or let
    probe_dedup_index_auto route on the measured crossover). Results
    are row-identical to probe_dedup_index (pinned by test).

    The bucket count is READ FROM THE INDEX (``_BUCKETS`` sidecar),
    never guessed: probing an N-bucket tree with a different count
    computes wrong pmod ids and silently drops files — false
    negatives with no error. ``buckets``, if given, is validated
    against the sidecar. ensure_index_table runs first so a pending
    interrupted compaction is finished/aborted BEFORE the file glob —
    otherwise a crash between the fold commit and the source deletes
    would leave both on disk and this path read would double-count
    postings."""
    actual = index_bucket_count(index_path)
    if buckets is not None and buckets != actual:
        raise ValueError(
            f"index at {index_path} was built with {actual} buckets, "
            f"not {buckets}"
        )
    ensure_index_table(spark, index_path, actual)
    batch_post = postings_with_sizes(
        batch_docs.select("doc_id", "text")
    ).localCheckpoint()
    touched = _touched_buckets(batch_post, actual)
    return _probe_pruned(spark, batch_post, index_path, touched)


# Fraction of buckets touched below which the pruned path wins.
# Measured crossover (PRUNED_PROBE_r7, 1024-bucket index): pruned wins
# at 142/1024 touched (0.14) and loses by 779/1024 (0.76); ~0.3 splits
# the measured gap. The constant trades two regimes whose costs scale
# differently (pruned: shuffle of touched slices; full: co-located
# map scan of everything), so anywhere in the measured window is
# within noise of min(full, pruned) — PRUNED_PROBE artifacts re-check
# per round.
AUTO_PRUNE_THRESHOLD = 0.3

# Safety margin on the ESTIMATED touched fraction before skipping the
# exact touched-set computation (VERDICT r9 task 6): only a clearly-
# above-threshold estimate routes full without the exact set; the gray
# zone still computes it (a mis-skip at the boundary costs ~nothing by
# definition of the crossover, but the margin keeps HLL error and
# balls-in-bins variance from mis-routing a genuinely sparse batch).
_ESTIMATE_MARGIN = 1.2

# Index width above which the router pre-estimates with HLL before the
# exact touched-set job. BELOW this, the exact job is already minimal:
# its map side partially distincts pmod values, so the shuffle is
# bounded by width x upstream-partitions ids — ~32k longs on the
# 1024-bucket artifact index, one ~0.15 s job at EVERY batch size
# (measured r10; the r9 "router overhead at full-route sizes" was host
# noise on top of that job). The HLL tier would ADD a second job in
# the pruned regime (which must compute the exact set anyway), so it
# only pays off where the bounded shuffle itself gets big: very wide
# production indexes (10^5-10^6 buckets x 10^3 partitions).
_ESTIMATE_MIN_WIDTH = 4096


def _route_touched(batch_post: DataFrame, width: int) -> set[int] | None:
    """Touched-bucket set for routing, or None = "route full, the
    batch plainly touches most buckets". On very wide indexes
    (> _ESTIMATE_MIN_WIDTH) a single-row HLL agg (partial aggregation
    only, no wide shuffle) first estimates the distinct shingle count
    s, giving expected touched = B(1-(1-1/B)^s) under the writer's
    uniform Murmur3 placement; a clearly-above-threshold estimate
    routes full without ever materializing the exact set. Otherwise —
    and in the estimator's gray zone — the exact set is computed,
    which the pruned read needs anyway and whose shuffle is bounded
    by width x partitions regardless of batch size."""
    if width > _ESTIMATE_MIN_WIDTH:
        sd = batch_post.agg(
            F.approx_count_distinct("shingle").alias("sd")
        ).first()[0]
        exp_touched = width * (1.0 - (1.0 - 1.0 / width) ** int(sd or 0))
        if exp_touched > AUTO_PRUNE_THRESHOLD * width * _ESTIMATE_MARGIN:
            return None
    return _touched_buckets(batch_post, width)


def probe_dedup_index_auto(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_path: str,
) -> DataFrame:
    """Route a probe between the bucket-pruned path read and the
    co-located full-table scan on the observed |touched|/buckets
    ratio — the policy PRUNED_PROBE_r7 measured but left to the
    caller. The touched set costs one distinct+collect over the batch
    postings (bounded by the bucket count) and is computed anyway on
    the pruned path; both routes return row-identical results, so the
    choice is purely physical. Same PRECONDITION as probe_dedup_index:
    batch doc_ids disjoint from the index's (probe_match_pairs's fused
    aggregation assumes it). r10: the exact touched-set distinct is
    skipped when the HLL estimate says the batch plainly routes full
    (_route_touched) — auto tracks min(full, pruned) at every size."""
    actual = index_bucket_count(index_path)
    table = ensure_index_table(spark, index_path, actual)
    batch_post = postings_with_sizes(
        batch_docs.select("doc_id", "text")
    ).localCheckpoint()
    touched = _route_touched(batch_post, actual)
    if touched is not None and len(touched) <= AUTO_PRUNE_THRESHOLD * actual:
        return _probe_pruned(spark, batch_post, index_path, touched)
    state = mask_deleted(
        spark, spark.table(table).select(*_POSTINGS_COLS), index_path
    )
    return probe_match_pairs(batch_post, state)


# Routing is skipped for indexes at or below this width: computing the
# touched-bucket set costs one small collect job per call, and a batch
# probing a NARROW index touches most buckets anyway (the 32-bucket
# st6 fixture would always route full) — routing there would be pure
# per-micro-batch fixed overhead, the exact cost class the r7
# ensure-cache fix removed from the admit path.
AUTO_PRUNE_MIN_WIDTH = 64


def routed_state_postings(
    spark: SparkSession,
    table: str,
    index_path: str,
    batch_post: DataFrame,
    below_batch: int | None = None,
) -> DataFrame:
    """Tombstone-masked state postings for a probe, auto-routed between
    the co-located full-table scan and the bucket-file-pruned path read
    — probe_dedup_index_auto's crossover policy, factored out so the
    STREAMING admit path gets it too (r8 watch item): ``below_batch``
    is the admit loop's ``batch_id < current`` read filter, applied at
    FILE level on the pruned route (the current batch's own partial
    prior attempt stays invisible on replay) and as the usual partition
    filter on the full route. Narrow indexes (<= AUTO_PRUNE_MIN_WIDTH)
    skip routing outright — no touched-set job, no behavior change."""
    key = (spark.sparkContext.applicationId, str(index_path))
    cached = _ENSURED.get(key)
    width = cached[1] if cached is not None else index_bucket_count(index_path)
    if width > AUTO_PRUNE_MIN_WIDTH:
        touched = _route_touched(batch_post, width)
        if touched is not None and len(touched) <= AUTO_PRUNE_THRESHOLD * width:
            return _pruned_state(spark, index_path, touched, below_batch)
    state = spark.table(table)
    if below_batch is not None:
        state = state.filter(F.col("batch_id") < below_batch)
    return mask_deleted(spark, state.select(*_POSTINGS_COLS), index_path)


def _bucket_of(file_name: str) -> int:
    """Bucket id encoded in a bucketed part file's name: the _NNNNN
    suffix after the task id (part-00000-<uuid>_00017.c000...)."""
    stem = file_name.split(".")[0]
    return int(stem.rsplit("_", 1)[1])


def _default_index_path(sf_dir: str) -> str:
    # the schema tag versions the at-rest layout: bumping it makes a
    # live machine's stale indexes (older schema) unreachable instead
    # of colliding with the new DDL at the same location
    digest = hashlib.md5(f"{sf_dir}:{_SCHEMA_TAG}".encode()).hexdigest()[:12]
    return f"/tmp/spark_graft_dedup_index/{digest}"


def reset_index(spark: SparkSession, index_path: str) -> None:
    """Wipe an index (files + catalog entry + ensure cache) so a
    REBUILD starts from nothing. Rebuild-by-append is not enough:
    overwriting batch 0..k replaces those partitions, but a previous
    compaction's fold generation (negative id) would survive and merge
    STALE rows into the next fold — the rebuild branches of
    q_x44b/c/d call this first."""
    import shutil

    shutil.rmtree(index_path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {index_table_name(index_path)}")
    _ENSURED.pop(
        (spark.sparkContext.applicationId, str(index_path)), None
    )


def _corpus_stamp(sf_dir: str) -> str:
    """Content fingerprint of the documents table, for the
    rebuild-iff-changed markers: path + every parquet data file's
    (relative name, size, mtime_ns). Pure os.stat — no Spark job. A
    row COUNT alone is not enough: a regenerated corpus with equal
    cardinality but different text would silently probe a stale
    index."""
    root = Path(sf_dir, "documents.parquet")
    files = sorted(
        (str(p.relative_to(root)), p.stat().st_size, p.stat().st_mtime_ns)
        for p in (root.rglob("*") if root.is_dir() else [root])
        if p.is_file() and not p.name.startswith(("_", "."))
    )
    digest = hashlib.md5(repr(files).encode()).hexdigest()
    return f"{sf_dir}:{digest}"


@register(
    "q_x44b_incrdedup_indexed",
    oracle=_INCR_ORACLE,
    doc="Incremental corpus dedup against the PERSISTED bucketed "
    "shingle index — the at-rest twin of q_x44_incrdedup, gated by "
    "the SAME oracle (byte-identical results, different physical "
    "plan). First call per sf_dir builds the index "
    "(build_dedup_index: one bucketed write of xxhash64 postings, "
    "amortized across every subsequent ingest); the probe itself "
    "shuffles only the batch postings — the corpus side scans in "
    "place (Bucketed: true, no Exchange), which is what makes daily "
    "ingest affordable when the corpus is 1000x the batch. "
    "SCALE_PROBE_INDEX_r7.json measures probe-vs-recompute to x32.",
)
def q_x44b_incrdedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_path = _default_index_path(sf_dir)
    marker = Path(index_path, "_BUILT_FOR")
    docs = _docs(spark, sf_dir)
    # rebuild iff the corpus changed — the stamp fingerprints the
    # parquet files' (name, size, mtime), so scale_probe's regenerated
    # trees re-index even at identical row counts
    stamp = _corpus_stamp(sf_dir)
    if marker.exists() and marker.read_text() == stamp:
        table = ensure_index_table(spark, index_path)
    else:
        reset_index(spark, index_path)
        table = build_dedup_index(spark, sf_dir, index_path)
        marker.write_text(stamp)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    return probe_dedup_index(spark, batch, table, index_path).transform(
        barrier_sort("doc_new", "doc_match")
    )


Q44C_BUILD_BATCHES = 4  # ingests simulated before the compaction


@register(
    "q_x44c_incrdedup_compacted",
    oracle=_INCR_ORACLE,
    doc="Incremental corpus dedup against a COMPACTED index — same "
    f"oracle as q_x44/q_x44b (byte-identical results): the corpus is "
    f"ingested as {Q44C_BUILD_BATCHES} separate batch appends (each "
    "leaving one file per bucket, the small-files decay a real "
    "index accrues), then compact_index folds the sealed batches "
    "into ONE partition with one file per bucket before the probe. "
    "Gates the full maintenance lifecycle — append, fold, "
    "crash-recoverable swap (tests/test_dedup_index.py), probe — "
    "not just the happy-path build.",
)
def q_x44c_incrdedup_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_path = _default_index_path(sf_dir) + "_cmp"
    marker = Path(index_path, "_BUILT_FOR")
    docs = _docs(spark, sf_dir)
    stamp = _corpus_stamp(sf_dir)
    if marker.exists() and marker.read_text() == stamp:
        table = ensure_index_table(spark, index_path)
    else:
        reset_index(spark, index_path)  # a stale fold must not survive
        table = ensure_index_table(spark, index_path)
        corpus = _docs(spark, sf_dir).filter(F.col("doc_id") % INCR_MOD != 0)
        for b in range(Q44C_BUILD_BATCHES):
            part = corpus.filter(
                F.col("doc_id") % Q44C_BUILD_BATCHES == b
            )
            append_index_batch(spark, table, postings_with_sizes(part), b)
        compact_index(spark, index_path, Q44C_BUILD_BATCHES - 1)
        marker.write_text(stamp)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    return probe_dedup_index(spark, batch, table, index_path).transform(
        barrier_sort("doc_new", "doc_match")
    )


# Fixture geometry for the PRUNED probe gate: a sparse batch modulus
# (10 docs at sf0.01 vs INCR_MOD's 50) over a WIDE index, so the
# batch's shingles hash into a genuine subset of the buckets and the
# auto router takes the pruned path where the driver's oracle gate
# runs (sf0.01); at sf0.1 the 100-doc batch touches most buckets and
# the same query gates the full-scan route — both SFs thereby
# oracle-cover one routing branch each, and tests pin row-identity.
PRUNED_MOD = 50


def _pruned_buckets(n_docs: int) -> int:
    """Index width for the q_x44d fixture, derived from corpus size.
    The small (oracle-gate) corpus gets a deliberately OVER-wide 2048
    buckets — the point there is the width RATIO (a 10-doc batch's
    ~500 shingles touch ~0.2 of the buckets, which is what a daily
    batch sees against a production-width index), so the auto router
    demonstrably takes the pruned path under the driver's gate. The
    larger bench corpus routes full regardless (its 100-doc batch
    covers any width), so it gets a REALISTICALLY-sized 256 buckets:
    2048 there would mean a 38 s one-time build (2048 un-coalesceable
    bucket writer tasks) and 2048-file scans for nothing the fixture
    is trying to show."""
    return 2048 if n_docs <= 1000 else 256


@register(
    "q_x44d_incrdedup_pruned",
    oracle=_incr_oracle(PRUNED_MOD),
    doc="Incremental corpus dedup through probe_dedup_index_auto over "
    f"a WIDE (corpus-size-derived, _pruned_buckets) index with a "
    f"sparse (doc_id % {PRUNED_MOD} = 0) batch: the driver-gated form "
    "of BUCKET-FILE "
    "PRUNING, the O(touched-buckets) per-ingest scan a small daily "
    "batch earns on a production-width index (PRUNED_PROBE_r7 "
    "measured the crossover; the router picks pruned vs co-located "
    "full scan on |touched|/buckets). Same semantics and oracle shape "
    "as q_x44 at a different batch modulus — byte-identical to the "
    "recompute form on this fixture.",
)
def q_x44d_incrdedup_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_path = _default_index_path(sf_dir) + "_wide"
    marker = Path(index_path, "_BUILT_FOR")
    docs = _docs(spark, sf_dir)
    stamp = _corpus_stamp(sf_dir)
    if not (marker.exists() and marker.read_text() == stamp):
        reset_index(spark, index_path)  # width may change with corpus
        table = ensure_index_table(
            spark, index_path, _pruned_buckets(docs.count())
        )
        corpus = docs.filter(F.col("doc_id") % PRUNED_MOD != 0)
        append_index_batch(spark, table, postings_with_sizes(corpus), 0)
        marker.write_text(stamp)
    batch = docs.filter(F.col("doc_id") % PRUNED_MOD == 0)
    return probe_dedup_index_auto(spark, batch, index_path).transform(
        barrier_sort("doc_new", "doc_match")
    )


# Which indexed-corpus docs the q_x44e fixture retracts: doc_id % 3 = 2
# deletes a third of the corpus, chosen so the retraction removes
# matches at EVERY gate SF (rem 2 kills 4 of q_x44's 6 sf0.01 matches
# — a delete set that happened to miss every match would gate
# nothing).
DELETED_MOD, DELETED_REM = 3, 2


def _incr_oracle_deleted(mod: int) -> str:
    """q_x44's incremental-dedup oracle minus RETRACTED corpus docs:
    the same truth definition with corpus-side (doc_id % mod <> 0)
    documents satisfying the DELETED_MOD/REM predicate excluded from
    the match side — batch docs are never deleted, and intra-batch
    (earlier-id) matching is unaffected."""
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
), sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM words a
  JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
), common AS (
  SELECT x.doc_id AS doc_new, y.doc_id AS doc_match, COUNT(*) AS c
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
  WHERE x.doc_id % {mod} = 0
    AND (y.doc_id % {mod} <> 0 OR y.doc_id < x.doc_id)
    AND NOT (y.doc_id % {mod} <> 0
             AND y.doc_id % {DELETED_MOD} = {DELETED_REM})
  GROUP BY 1, 2
)
SELECT doc_new, doc_match,
       ROUND(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_new = sa.doc_id
JOIN sizes sb ON doc_match = sb.doc_id
WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
ORDER BY 1, 2
"""


@register(
    "q_x44e_incrdedup_deleted",
    oracle=_incr_oracle_deleted(INCR_MOD),
    doc="Incremental corpus dedup AFTER RETRACTIONS — the index "
    "lifecycle's delete leg, oracle-gated end-to-end: the corpus is "
    "ingested as two batch appends, a third of it (doc_id % "
    f"{DELETED_MOD} = {DELETED_REM}) is tombstone-deleted "
    "(delete_from_index), compact_index PHYSICALLY drops the "
    "tombstoned postings during its manifest-recoverable fold, and "
    "the incoming batch then probes the folded index — retracted docs "
    "must never match (the oracle is q_x44's truth minus the deleted "
    "set). The probe-time mask (broadcast anti-join, state scan still "
    "co-located) is what answers queries BETWEEN delete and fold; "
    "this fixture gates the post-fold state, and "
    "tests/test_dedup_index.py pins the pre-fold mask, the fold's "
    "file-level row drop, and the delete/fold crash windows.",
)
def q_x44e_incrdedup_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_path = _default_index_path(sf_dir) + "_del"
    marker = Path(index_path, "_BUILT_FOR")
    docs = _docs(spark, sf_dir)
    # fixture params ride the stamp: changing the delete set must bust
    # the cached index, not silently probe the old retractions
    stamp = f"{_corpus_stamp(sf_dir)}:del{DELETED_MOD}.{DELETED_REM}"
    if not (marker.exists() and marker.read_text() == stamp):
        reset_index(spark, index_path)
        table = ensure_index_table(spark, index_path)
        corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
        for b in range(2):
            part = corpus.filter(F.col("doc_id") % 2 == b)
            append_index_batch(spark, table, postings_with_sizes(part), b)
        delete_from_index(
            spark,
            index_path,
            corpus.filter(
                F.col("doc_id") % DELETED_MOD == DELETED_REM
            ).select("doc_id"),
        )
        compact_index(spark, index_path, 1)  # physically drops tombstoned rows
        marker.write_text(stamp)
    else:
        table = ensure_index_table(spark, index_path)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    return probe_dedup_index(spark, batch, table, index_path).transform(
        barrier_sort("doc_new", "doc_match")
    )
