"""Streaming embedding ingest into the at-rest IVF-PQ index — the ANN
twin of streaming/neardup_ingest.py, completing the index lifecycle:
TRAIN once (build_ivfpq_index), then a checkpointed file stream APPENDS
every arriving embedding batch against the frozen centroids/codebooks
(append_ivfpq_batch) and periodically FOLDS the accrued small files
(compact_ivfpq_index), while query_ivfpq_index keeps answering
unchanged throughout.

Exactly-once composition (same algebra as the other ingests):

- The file source + checkpoint replay the last uncommitted batch with
  the SAME batch_id (at-least-once).
- append_ivfpq_batch writes one (cell, index_batch_id) sub-partition
  set per batch via dynamic partition overwrite, so a replay overwrites
  ONLY its own files (idempotent). Stream batch b maps to index batch
  b + 1 — the trained build owns batch_id 0.
- compact_every=k folds only SEALED ids (strictly below the in-flight
  batch's), so a replay can never target a folded partition; replaying
  the compaction itself just folds the same rows into the next
  generation (idempotent by construction — see similarity.py's
  manifest protocol).

Scale: per-batch work is O(batch) — assign + encode are Arrow-batched
map passes against broadcast-size centroids/codebooks, and the write
touches only the batch's own sub-partitions. The corpus is never
rescanned or reshuffled by an append; compaction is the only operation
that rewrites at-rest bytes, on an operator-chosen cadence. The
no-retrain drift boundary is measured (IVFPQ_DRIFT_r8.json): recall on
incoming batches holds until they wander ~2x the training
distribution's norm scale — the rebuild trigger is a recall probe, not
a row count.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

EMB_STREAM_COLS = ("vec_id", "embedding")


def stream_embedding_ingest(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
) -> None:
    """Drain an embeddings file-stream (one file per micro-batch) into
    a PRE-TRAINED IVF-PQ index with availableNow semantics. The index
    must exist (build_ivfpq_index): training is a deliberate, rare
    event on a bootstrap corpus — a stream must never silently retrain,
    because every stored code is only decodable against the codebooks
    that produced it."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from ..operators.similarity import (
        append_ivfpq_batch,
        compact_ivfpq_index,
    )

    if not Path(index_path, "_ivf_centroids.json").exists():
        raise ValueError(
            f"no trained IVF-PQ index at {index_path}: run "
            "build_ivfpq_index on a bootstrap corpus first (streams "
            "append against FROZEN codebooks, never retrain)"
        )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    vecs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id >= compact_every and batch_id % compact_every == 0:
            # fold the trained build (0) + every sealed append
            # (<= batch_id, i.e. stream batches < batch_id): the
            # in-flight batch writes batch_id + 1, never a fold source
            compact_ivfpq_index(spark, index_path, batch_id)
        append_ivfpq_batch(
            spark,
            index_path,
            batch_df.select(*EMB_STREAM_COLS),
            batch_id + 1,  # index batch 0 is the trained build
        )

    q = (
        vecs.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


VEC_EVENTS_STREAM_COLS = ("kind", "vec_id", "embedding")


def stream_embedding_retract_ingest(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
) -> None:
    """Drain a MIXED embedding event stream — ``vec`` (ingest) and
    ``retract`` (take down an already-indexed vector) — into a
    pre-trained IVF-PQ index: the ANN twin of
    streaming/retract_ingest.py, completing the delete lifecycle's
    streaming leg on BOTH at-rest indexes.

    Per micro-batch, retractions apply FIRST (exactly-once batch-tagged
    tombstone file — delete_vectors(batch_tag=batch_id), an atomic
    replace on replay), then the batch's ``vec`` rows append against
    the frozen codebooks. A retracted vector stops being findable
    through query_ivfpq_index IMMEDIATELY (the query masks tombstones
    at plan time); its codes leave the at-rest files at the next
    compact_every fold, which is computed tombstone-masked. Crash in
    any window — after the tombstone file, after the append's
    sub-partitions, or between — replays to identical state: both
    writes are idempotent overwrites keyed by batch_id.

    Contract (ENFORCED, like retract_ingest): vec_ids are never
    reused. A ``vec`` row whose id is already tombstoned raises
    ValueError before the batch's append — the mask would silently
    hide the new rows too. The failed batch is replay-safe: the raise
    precedes the append, and the batch's tombstone write is an
    idempotent batch-keyed replacement."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.similarity import (
        append_ivfpq_batch,
        compact_ivfpq_index,
        delete_vectors,
    )

    if not Path(index_path, "_ivf_centroids.json").exists():
        raise ValueError(
            f"no trained IVF-PQ index at {index_path}: run "
            "build_ivfpq_index on a bootstrap corpus first (streams "
            "append against FROZEN codebooks, never retrain)"
        )

    schema = StructType(
        [
            StructField("kind", StringType()),
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id >= compact_every and batch_id % compact_every == 0:
            # sealed ids only (< this batch's append id); this batch's
            # own retractions are written AFTER the fold, so they drop
            # physically at the NEXT fold — masking is immediate either
            # way
            compact_ivfpq_index(spark, index_path, batch_id)
        retract_ids = [
            r[0]
            for r in batch_df.filter(F.col("kind") == "retract")
            .select(F.col("vec_id").cast("long"))
            .collect()
        ]
        if retract_ids:
            # skip the write when the batch has no retractions (ADVICE
            # r9): an unconditional zero-row file would create the
            # tombstone sidecar on a takedown-free stream and defeat
            # the tomb_dir-absent fast path forever. Replay-safe — a
            # replayed batch derives the same empty set.
            delete_vectors(
                spark, index_path, retract_ids, batch_tag=batch_id
            )
        # ENFORCED CONTRACT: a vec row re-ingesting a tombstoned id is
        # an upstream bug (the mask would hide its new codes forever).
        # One broadcast-sized semi-join, only when tombstones exist.
        tomb_dir = Path(index_path, "_TOMBSTONES")
        if tomb_dir.exists():
            tomb = spark.read.schema("vec_id BIGINT").parquet(
                str(tomb_dir)
            )
            reused = [
                r[0]
                for r in batch_df.filter(F.col("kind") == "vec")
                .select(F.col("vec_id").cast("long"))
                .join(F.broadcast(tomb), "vec_id", "left_semi")
                .limit(20)
                .collect()
            ]
            if reused:
                raise ValueError(
                    f"batch {batch_id} re-ingests retracted vec_ids "
                    f"{sorted(reused)} (first 20 shown): vec_ids are "
                    "never reused — a tombstoned id's codes would be "
                    "silently masked. Repair the upstream feed; the "
                    "batch is replay-safe (the append has not run)."
                )
        append_ivfpq_batch(
            spark,
            index_path,
            batch_df.filter(F.col("kind") == "vec").select(
                "vec_id", "embedding"
            ),
            batch_id + 1,  # index batch 0 is the trained build
        )

    q = (
        events.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
