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

from .dedup import INCR_MOD, JACCARD_THRESHOLD, _INCR_ORACLE, _docs, shingles
from .relational import barrier_sort, register

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
    doc's shingle-set size denormalized onto every row (one window
    shuffle at build time; saves the corpus-wide sizes aggregation on
    every subsequent probe)."""
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


def ensure_index_table(
    spark: SparkSession,
    index_path: str,
    buckets: int = DEDUP_INDEX_BUCKETS,
) -> str:
    """Idempotently (re-)register the external bucketed postings table
    over ``index_path`` and recover any partitions already on disk.
    Returns the catalog table name.

    Needed on every fresh session: the in-memory catalog holds no
    metadata across processes, but the DDL is deterministic and the
    bucketed parquet files on disk are self-describing (bucket id is
    encoded in the file name), so re-registration is metadata-only."""
    table = index_table_name(index_path)
    Path(index_path).mkdir(parents=True, exist_ok=True)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} "
        "(doc_id BIGINT, shingle BIGINT, n INT, batch_id INT) "
        "USING parquet PARTITIONED BY (batch_id) "
        f"CLUSTERED BY (shingle) SORTED BY (shingle) "
        f"INTO {buckets} BUCKETS "
        f"LOCATION '{index_path}'"
    )
    spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
    # files may have changed under an already-registered name (another
    # process appended a batch): drop any stale cached listing
    spark.sql(f"REFRESH TABLE {table}")
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
    spark.sql(f"REFRESH TABLE {table}")


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
#   1. manifest {"through": w, "rows": n} written to the index root
#   2. consolidated rows (all batch_id <= w, relabeled w) committed to
#      partition w via dynamic-overwrite insertInto (per-partition
#      staging + rename; a crash mid-job leaves partition w unchanged)
#   3. source partition DIRECTORIES batch_id < w deleted (the table is
#      EXTERNAL: DROP PARTITION alone would leave files for a later
#      RECOVER PARTITIONS to resurrect)
#   4. manifest removed
# ensure_index_table() runs _recover_compaction() on every open: a
# manifest with partition w's row count == n means step 2 committed —
# finish steps 3-4; any other state means it did not — abort by
# removing the manifest (source partitions are still intact).
# Step 2's count check cannot false-positive: the old partition w can
# only equal n when batches < w contribute zero rows, in which case
# folding is a no-op anyway.

_COMPACT_MANIFEST = "_COMPACT_MANIFEST"  # "_"-prefix: invisible to scans


def compact_index(
    spark: SparkSession, index_path: str, through_batch: int
) -> None:
    """Fold every partition with ``batch_id <= through_batch`` into the
    single partition ``through_batch``. The caller must only pass a
    SEALED watermark (a batch id the stream can never replay — in
    streaming/neardup_ingest.py, anything below the batch currently
    being processed): replaying a folded batch would recreate its
    partition alongside its rows in the fold. Idempotent — compacting
    an already-compacted range rewrites the same rows."""
    import json

    table = ensure_index_table(spark, index_path)  # finishes pending folds
    src = spark.table(table).filter(F.col("batch_id") <= through_batch)
    # localCheckpoint breaks lineage: the write below OVERWRITES a
    # partition this plan reads (Spark forbids self-overwrite reads).
    # A compaction necessarily rewrites its bytes somewhere; block
    # storage here plays the staging-dir role a cluster FS would.
    consolidated = (
        src.select(*_POSTINGS_COLS)
        .withColumn("batch_id", F.lit(through_batch))
        .localCheckpoint()
    )
    n = consolidated.count()
    manifest = Path(index_path, _COMPACT_MANIFEST)
    manifest.write_text(json.dumps({"through": through_batch, "rows": n}))
    _insert_dynamic(consolidated, table)
    spark.sql(f"REFRESH TABLE {table}")
    _recover_compaction(spark, table, index_path)
    consolidated.unpersist()


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
    w, n = int(meta["through"]), int(meta["rows"])
    committed = (
        spark.table(table).filter(F.col("batch_id") == w).count() == n
    )
    if committed:
        for part in Path(index_path).glob("batch_id=*"):
            pid = int(part.name.split("=", 1)[1])
            if pid < w:
                shutil.rmtree(part)
                # the table is EXTERNAL so this is metadata-only (the
                # files are already gone); RECOVER only ADDS partitions
                # and would leave a dangling catalog entry otherwise
                spark.sql(
                    f"ALTER TABLE {table} DROP IF EXISTS "
                    f"PARTITION (batch_id={pid})"
                )
        spark.sql(f"REFRESH TABLE {table}")
    manifest.unlink()


def neardup_match_pairs(
    x_post: DataFrame,
    y_post: DataFrame,
    pair_filter: Column | None = None,
) -> DataFrame:
    """(d, e, jaccard) — probe-side docs ``d`` (from x_post) matched to
    ``e`` (from y_post) at exact shingle Jaccard >= JACCARD_THRESHOLD.

    Both sides carry (doc_id, shingle, n); the join is a pure
    shingle equi-join (the bucketed corpus side keeps its on-disk
    partitioning — no Exchange), set sizes ride the candidate groupBy
    as first() aggregates, and only docs sharing >= 1 shingle ever
    meet (no cartesian). ``pair_filter`` adds a post-join predicate on
    the aliased sides (e.g. id-order for intra-batch matching).

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
    common = joined.groupBy(
        F.col("x.doc_id").alias("d"), F.col("y.doc_id").alias("e")
    ).agg(
        F.count("*").alias("c"),
        F.first("x.n").alias("na"),
        F.first("y.n").alias("nb"),
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return common.filter(jac >= JACCARD_THRESHOLD).select(
        "d", "e", F.round(jac, 4).alias("jaccard")
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
    spark: SparkSession, batch_docs: DataFrame, table: str
) -> DataFrame:
    """(doc_new, doc_match, jaccard) — the incoming batch probed
    against the at-rest index AND against earlier (smaller doc_id)
    docs of its own batch: exactly q_x44_incrdedup's semantics with
    the corpus side read from the bucketed table instead of
    recomputed. Per-probe shuffle cost is O(batch): the index scan is
    co-located (Bucketed: true, no Exchange — pinned by
    tests/test_dedup_index.py)."""
    batch_post = postings_with_sizes(
        batch_docs.select("doc_id", "text")
    ).localCheckpoint()  # small; read by both joins below
    state = spark.table(table).select(*_POSTINGS_COLS)
    vs_index = neardup_match_pairs(batch_post, state)
    vs_batch = neardup_match_pairs(
        batch_post,
        batch_post,
        pair_filter=F.col("y.doc_id") < F.col("x.doc_id"),
    )
    return vs_index.unionByName(vs_batch).select(
        F.col("d").alias("doc_new"),
        F.col("e").alias("doc_match"),
        "jaccard",
    )


def probe_dedup_index_pruned(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_path: str,
    buckets: int = DEDUP_INDEX_BUCKETS,
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
    predicates prune buckets), so this composes it manually:
    bucket_id = pmod(hash(shingle), buckets) — F.hash IS the Murmur3
    the bucketed writer uses, pinned by
    tests/test_dedup_index.py::test_file_hash_matches_bucket_id —
    collect the batch's touched set (<= `buckets` ints, bounded
    driver traffic), then read only those part files. The trade:
    path-read postings lose the catalog's bucketing metadata, so the
    join shuffles BOTH sides — right when batch << corpus, shuffling
    two small slices beats map-scanning the whole table; when the
    batch touches most buckets (our 10%-of-corpus test batch over 32
    buckets does), use probe_dedup_index's co-located scan instead.
    Results are row-identical to probe_dedup_index (same test)."""
    batch_post = postings_with_sizes(
        batch_docs.select("doc_id", "text")
    ).localCheckpoint()
    touched = {
        r[0]
        for r in batch_post.select(
            F.pmod(F.hash("shingle"), F.lit(buckets)).alias("b")
        )
        .distinct()
        .collect()
    }
    files = [
        str(f)
        for f in Path(index_path).glob("batch_id=*/part-*")
        if _bucket_of(f.name) in touched
    ]
    state = (
        spark.read.schema("doc_id BIGINT, shingle BIGINT, n INT")
        .parquet(*files)
        if files
        else spark.createDataFrame(
            [], "doc_id BIGINT, shingle BIGINT, n INT"
        )
    )
    vs_index = neardup_match_pairs(batch_post, state)
    vs_batch = neardup_match_pairs(
        batch_post,
        batch_post,
        pair_filter=F.col("y.doc_id") < F.col("x.doc_id"),
    )
    return vs_index.unionByName(vs_batch).select(
        F.col("d").alias("doc_new"),
        F.col("e").alias("doc_match"),
        "jaccard",
    )


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
    # rebuild iff the corpus changed (count is parquet-metadata cheap);
    # keyed by path+count so scale_probe's regenerated trees re-index
    stamp = f"{sf_dir}:{docs.count()}"
    if marker.exists() and marker.read_text() == stamp:
        table = ensure_index_table(spark, index_path)
    else:
        table = build_dedup_index(spark, sf_dir, index_path)
        marker.write_text(stamp)
    batch = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    return probe_dedup_index(spark, batch, table).transform(
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
    stamp = f"{sf_dir}:{docs.count()}"
    if marker.exists() and marker.read_text() == stamp:
        table = ensure_index_table(spark, index_path)
    else:
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
    return probe_dedup_index(spark, batch, table).transform(
        barrier_sort("doc_new", "doc_match")
    )
