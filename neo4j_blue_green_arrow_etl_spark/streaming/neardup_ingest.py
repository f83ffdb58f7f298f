"""Streaming near-dup admission: exactly-once ingest that admits a
document only if it is not a near-duplicate (exact shingle Jaccard >=
JACCARD_THRESHOLD) of any EARLIER document — the continuous form of
operators.dedup.q_x44_incrdedup, and the shape a 100 TB pipeline runs
on its live crawl feed.

Design:

- The dedup STATE is the shingle-postings table of previously seen
  docs, persisted as parquet under ``state_dir`` — the same "corpus
  index" q_x44 probes, grown batch by batch. State size is
  O(distinct shingles of seen docs), partitioned/bucketable by shingle
  at scale; nothing is held on the driver.
- Each micro-batch runs the q_x44 probe join: batch shingles vs state
  postings (plus earlier docs of the SAME batch, doc_id order), exact
  Jaccard verify, NOT-EXISTS -> admitted.
- foreachBatch writes are made EXACTLY-ONCE the same way
  streaming/ingest.py does it: every output file carries the batchId
  (``admitted-b<id>.parquet`` / ``state-b<id>.parquet``), so a replayed
  batch OVERWRITES its own files instead of duplicating rows. A batch
  that crashed mid-write re-runs with the same id and re-derives the
  same admissions because its inputs (prior-batch state files) are
  immutable.

Admission rule (deterministic, SQL-expressible — the q_st6_neardup
oracle): doc d is admitted iff NO doc e with order key (batch(e),
e.doc_id) < (batch(d), d.doc_id) has Jaccard(d, e) >= threshold. Note
"any earlier doc", not "any earlier ADMITTED doc": the greedy
admitted-only variant is order-recursive (not one SQL pass) and drops
fewer docs; near-dup chains collapse to their FIRST element either
way, which is what dedup pipelines keep.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import JACCARD_THRESHOLD, shingles

DOCS_STREAM_COLS = ("doc_id", "text")


def _match_earlier(
    batch_sh: DataFrame, state_sh: DataFrame | None
) -> DataFrame:
    """doc_ids of batch docs near-dup-matched by state postings or by
    an earlier (smaller doc_id) doc of the same batch."""
    sizes_b = batch_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = batch_sh.alias("x")
    candidates = []
    if state_sh is not None:
        y = state_sh.alias("y")
        sizes_s = state_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
        common_s = (
            x.join(y, F.col("x.shingle") == F.col("y.shingle"))
            .groupBy(
                F.col("x.doc_id").alias("d"), F.col("y.doc_id").alias("e")
            )
            .agg(F.count("*").alias("c"))
        )
        sa, sb = sizes_b.alias("sa"), sizes_s.alias("sb")
        jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
        candidates.append(
            common_s.join(sa, F.col("d") == F.col("sa.doc_id"))
            .join(sb, F.col("e") == F.col("sb.doc_id"))
            .filter(jac >= JACCARD_THRESHOLD)
            .select("d")
        )
    z = batch_sh.alias("z")
    common_b = (
        x.join(
            z,
            (F.col("x.shingle") == F.col("z.shingle"))
            & (F.col("z.doc_id") < F.col("x.doc_id")),
        )
        .groupBy(F.col("x.doc_id").alias("d"), F.col("z.doc_id").alias("e"))
        .agg(F.count("*").alias("c"))
    )
    sa, sb = sizes_b.alias("sa"), sizes_b.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    candidates.append(
        common_b.join(sa, F.col("d") == F.col("sa.doc_id"))
        .join(sb, F.col("e") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("d")
    )
    out = candidates[0]
    for c in candidates[1:]:
        out = out.unionByName(c)
    return out.distinct()


def admit_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id: int,
) -> None:
    """One exactly-once micro-batch: admit non-near-dup docs, append
    their doc_ids to ``out_dir`` and their shingle postings to
    ``state_dir`` — every file named by batchId so replays overwrite
    rather than duplicate."""
    batch_docs = batch_docs.select(*DOCS_STREAM_COLS)
    batch_sh = shingles(batch_docs).localCheckpoint()
    state_files = sorted(Path(state_dir).glob("state-b*.parquet"))
    # this batch's own (possibly partial) prior attempt is NOT state
    state_files = [
        p for p in state_files if p.stem != f"state-b{batch_id}"
    ]
    state_sh = (
        spark.read.parquet(*[str(p) for p in state_files])
        if state_files
        else None
    )
    dropped = _match_earlier(batch_sh, state_sh)
    admitted = batch_docs.join(dropped, batch_docs.doc_id == dropped.d, "left_anti")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    admitted.select("doc_id").write.mode("overwrite").parquet(
        f"{out_dir}/admitted-b{batch_id}.parquet"
    )
    # State indexes EVERY seen doc's postings (admitted or dropped) —
    # the any-earlier rule: a doc that matches only a dropped dup is
    # itself a dup of the same chain and must drop too. This is also
    # what makes the rule one SQL pass (the oracle) instead of an
    # order-recursive greedy.
    batch_sh.write.mode("overwrite").parquet(
        f"{state_dir}/state-b{batch_id}.parquet"
    )


def stream_neardup_ingest(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain a documents file-stream (one file per micro-batch) through
    the near-dup admission pipeline with availableNow semantics."""
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
        admit_batch(spark, batch_df, state_dir, out_dir, batch_id)

    q = (
        docs.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def admitted_ids(spark: SparkSession, out_dir: str) -> DataFrame:
    files = sorted(Path(out_dir).glob("admitted-b*.parquet"))
    return spark.read.parquet(*[str(p) for p in files])
