"""Continuous snapshot orchestrator: the reference's file-watching
blue/green loop (orchestrator.py / orchestrator_prefect.py) re-expressed
as a micro-batch driver loop around Spark jobs.

Semantics carried over (SURVEY §2.9 ST1-ST9):
  ST1  scan every ``scan_interval`` seconds (micro-batch trigger)
  ST2  dedup against processed state + catalog existence (idempotent)
  ST3  late data: old-timestamp snapshots still LOAD, but the alias only
       switches if the snapshot is the customer's latest (latest-wins by
       event time, not arrival; reference orchestrator.py:322-324, 364-384)
  ST4  completeness gate (nodes/ and relationships/ non-empty) — in
       ``discover_snapshots``
  ST5  concurrency cap: ``max_concurrent_loads`` per scan
  ST6  retry with exponential backoff ``retry_backoff_base ** retries``,
       max ``max_retries``
  ST7  health-gated admission (session alive + db count below limit)
  ST8  graceful drain with ``shutdown_timeout``
  ST9  JSON status emission per cycle

The loop is deliberately driver-side: snapshot arrival is control-plane
(a few events/minute); the data plane — read, normalize, count, sink
write — is fully distributed Spark jobs. A Structured Streaming file
source would force one schema across heterogeneous snapshot dirs, so
discovery stays a directory scan feeding batch jobs (the Spark mapping
SURVEY §2.1 S4 sanctions).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import SparkSession

from ..config import DEFAULTS
from ..plans.catalog import DeploymentCatalog, db_name
from ..sources.snapshot import SnapshotRef, discover_snapshots, read_snapshot


@dataclass
class OrchestratorStats:
    """Running counters (reference orchestrator.py:169-213)."""

    discovered: int = 0
    completed: int = 0
    failed: int = 0
    retried: int = 0
    skipped_existing: int = 0
    health_deferred: int = 0
    alias_switches: int = 0
    cleaned_up: int = 0
    started_at: float = field(default_factory=time.time)

    def as_dict(self) -> dict[str, Any]:
        return {
            "uptime_sec": round(time.time() - self.started_at, 1),
            "discovered": self.discovered,
            "completed": self.completed,
            "failed": self.failed,
            "retried": self.retried,
            "skipped_existing": self.skipped_existing,
            "health_deferred": self.health_deferred,
            "alias_switches": self.alias_switches,
            "cleaned_up": self.cleaned_up,
        }


@dataclass
class _Task:
    snapshot: SnapshotRef
    retry_count: int = 0
    not_before: float = 0.0
    last_error: str | None = None


class Orchestrator:
    """Micro-batch snapshot loader with blue/green cutover."""

    def __init__(
        self,
        spark: SparkSession,
        data_path: str | Path,
        catalog: DeploymentCatalog | None = None,
        config: dict[str, Any] | None = None,
        status_path: str | Path | None = None,
        load_fn: Callable[[SparkSession, SnapshotRef, DeploymentCatalog], None] | None = None,
        clock: Callable[[], float] = time.time,
        heap_fraction_fn: Callable[[], float] | None = None,
    ):
        self.spark = spark
        self.data_path = Path(data_path)
        self.catalog = catalog or DeploymentCatalog(spark)
        cfg = dict(DEFAULTS["orchestrator"])
        cfg.update((config or {}).get("orchestrator", config or {}))
        self.cfg = cfg
        self.status_path = Path(status_path) if status_path else None
        self.load_fn = load_fn or self._default_load
        self.clock = clock
        self.heap_fraction_fn = heap_fraction_fn or self._jvm_heap_fraction
        self.stats = OrchestratorStats()
        self._queue: list[_Task] = []
        self._seen: set[tuple[str, int]] = set()
        self._stop = False

    # -- health (ST7) --------------------------------------------------

    def check_health(self) -> tuple[bool, str]:
        """Admission gate before each load (reference orchestrator.py:61-163):
        engine answers SELECT 1; deployment count below max_databases;
        JVM heap below ``heap_threshold_percent`` — the Spark-side
        equivalent of the reference's ``CALL dbms.queryJmx`` heap gate
        (reference orchestrator.py:111-152). The heap reading comes from
        ``heap_fraction_fn`` (injectable for tests; defaults to the
        driver JVM's Runtime memory counters, which in local mode IS the
        executor heap; on a cluster swap in an executor-metrics
        provider)."""
        try:
            ok = self.spark.sql("SELECT 1 AS health").collect()[0][0] == 1
        except Exception as e:  # session dead
            return False, f"session check failed: {e}"
        if not ok:
            return False, "health query returned wrong value"
        n_dbs = len(self.catalog.list_databases())
        if n_dbs >= self.cfg["max_databases"]:
            return False, f"too many databases: {n_dbs} >= {self.cfg['max_databases']}"
        threshold = self.cfg["heap_threshold_percent"] / 100.0
        try:
            frac = self.heap_fraction_fn()
        except Exception as e:  # metrics unavailable -> fail open, noted
            return True, f"ok (heap metrics unavailable: {e})"
        if frac >= threshold:
            return False, f"heap {frac:.0%} >= {threshold:.0%}"
        return True, "ok"

    def _jvm_heap_fraction(self) -> float:
        """Used/max heap of the driver JVM via java.lang.Runtime."""
        rt = self.spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        return (rt.totalMemory() - rt.freeMemory()) / rt.maxMemory()

    # -- discovery (ST1/ST2/ST4) --------------------------------------

    def scan_once(self) -> int:
        """One discovery pass: find complete snapshots not yet seen or
        deployed; enqueue them (reference scan_for_snapshots,
        orchestrator.py:226-273 + prefect existence check :339-345)."""
        found = 0
        for ref in discover_snapshots(self.data_path):
            key = (ref.customer_id, ref.timestamp)
            if key in self._seen:
                continue
            self._seen.add(key)
            if self.catalog.database_exists(ref.database):
                self.stats.skipped_existing += 1
                continue
            self._queue.append(_Task(ref))
            self.stats.discovered += 1
            found += 1
        return found

    # -- load pipeline (§3.1) -----------------------------------------

    @staticmethod
    def _default_load(
        spark: SparkSession, ref: SnapshotRef, catalog: DeploymentCatalog
    ) -> None:
        nodes, edges = read_snapshot(spark, ref)
        catalog.register_deployment(
            ref.customer_id, ref.timestamp, nodes, edges, source_path=str(ref.path)
        )

    def _is_latest_deployment(self, ref: SnapshotRef) -> bool:
        """Latest-wins by event time: compare against every deployment of
        this customer (reference _is_latest_deployment,
        orchestrator.py:364-384 — parses the ts suffix off db names)."""
        prefix = f"{ref.customer_id}-"
        latest = max(
            (int(n.split("-")[-1]) for n in self.catalog.list_databases(prefix)),
            default=-1,
        )
        return ref.timestamp >= latest

    def process_task(self, task: _Task) -> bool:
        """Load one snapshot end-to-end: health gate -> load -> maybe
        switch alias -> cleanup. Returns success (reference
        load_snapshot, orchestrator.py:300-362)."""
        ref = task.snapshot
        healthy, reason = self.check_health()
        if not healthy:
            # Health pressure is not the task's fault: re-queue with
            # backoff WITHOUT consuming a retry, so a snapshot is never
            # permanently failed by sustained pressure (e.g. databases
            # at max). Retries are reserved for actual load errors
            # (reference re-queues on health failure without counting,
            # orchestrator.py:310-316).
            task.last_error = f"health gate: {reason}"
            task.not_before = self.clock() + self.cfg["retry_backoff_base"]
            self._queue.append(task)
            self.stats.health_deferred += 1
            return False
        try:
            self.load_fn(self.spark, ref, self.catalog)
            if self._is_latest_deployment(ref):
                self.catalog.set_alias(ref.customer_id, ref.timestamp)
                self.stats.alias_switches += 1
            self.stats.cleaned_up += len(
                self.catalog.cleanup_old_deployments(
                    ref.customer_id, self.cfg["keep_count"]
                )
            )
            self.stats.completed += 1
            return True
        except Exception as e:
            self._fail(task, str(e))
            return False

    # -- retry (ST6) ---------------------------------------------------

    def _fail(self, task: _Task, error: str) -> None:
        task.last_error = error
        if task.retry_count < self.cfg["max_retries"]:
            task.retry_count += 1
            backoff = self.cfg["retry_backoff_base"] ** task.retry_count
            task.not_before = self.clock() + backoff
            self._queue.append(task)
            self.stats.retried += 1
        else:
            self.stats.failed += 1

    # -- status (ST9) --------------------------------------------------

    def write_status(self) -> dict[str, Any]:
        status = {
            **self.stats.as_dict(),
            "queue_size": len(self._queue),
            "databases": self.catalog.list_databases(),
            "aliases": self.catalog.list_aliases(),
        }
        if self.status_path:
            fd, tmp = tempfile.mkstemp(dir=str(self.status_path.parent), prefix=".status-")
            with os.fdopen(fd, "w") as f:
                json.dump(status, f, indent=2)
            os.replace(tmp, self.status_path)
        return status

    # -- main loop (ST1/ST5/ST8) --------------------------------------

    def run_cycle(self) -> int:
        """One micro-batch: scan, then process up to
        ``max_concurrent_loads`` due tasks. Returns tasks processed."""
        self.scan_once()
        now = self.clock()
        due = [t for t in self._queue if t.not_before <= now]
        processed = 0
        for task in due[: self.cfg["max_concurrent_loads"]]:
            self._queue.remove(task)
            self.process_task(task)
            processed += 1
        self.write_status()
        return processed

    def _drain_due(self) -> int:
        """Process up to ``max_concurrent_loads`` tasks whose backoff
        has elapsed; returns how many ran."""
        now = self.clock()
        due = [t for t in self._queue if t.not_before <= now]
        n = 0
        for task in due[: self.cfg["max_concurrent_loads"]]:
            self._queue.remove(task)
            self.process_task(task)
            n += 1
        return n

    def run_streaming(
        self,
        checkpoint: str | Path,
        processing_time: str | None = None,
    ):
        """The same ST1-ST9 pipeline driven by REAL Structured
        Streaming: the ``snapshotarrivals`` Python data source feeds
        ``foreachBatch``, so discovery dedup (ST2) is the engine's
        offset log in ``checkpoint`` — it survives restarts, unlike the
        in-memory ``_seen`` set of the driver-loop mode (which still
        guards within-process replays here). Each micro-batch enqueues
        the newly arrived snapshots and drains every task whose retry
        backoff has elapsed; backed-off tasks ride the queue to the
        next micro-batch (ST6). ``foreachBatch`` is at-least-once, so
        the catalog existence check makes batch replays idempotent
        (J3). With ``processing_time=None`` the trigger is
        availableNow (drain-and-stop — ST8 by construction); pass
        e.g. ``"30 seconds"`` for the reference's continuous cadence
        (ST1, config.yaml:27). Returns the StreamingQuery; the caller
        owns awaitTermination/stop."""
        from ..sources.snapshot_datasource import register_arrival_source

        register_arrival_source(self.spark)

        def handle(batch_df, _batch_id: int) -> None:
            rows = sorted(
                batch_df.collect(),
                key=lambda r: (r.customer_id, r.timestamp),
            )  # control-plane rows: a few per batch, never data-plane
            for r in rows:
                ref = SnapshotRef(r.customer_id, r.timestamp, r.path)
                key = (ref.customer_id, ref.timestamp)
                if key in self._seen:
                    continue
                self._seen.add(key)
                if self.catalog.database_exists(ref.database):
                    self.stats.skipped_existing += 1  # replayed batch
                    continue
                self._queue.append(_Task(ref))
                self.stats.discovered += 1
            while self._drain_due():
                pass
            self.write_status()

        writer = (
            self.spark.readStream.format("snapshotarrivals")
            .option("path", str(self.data_path))
            .load()
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", str(checkpoint))
        )
        if processing_time is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run(self, max_cycles: int | None = None, sleep: Callable[[float], None] = time.sleep) -> None:
        cycles = 0
        while not self._stop:
            self.run_cycle()
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                break
            sleep(self.cfg["scan_interval"])

    def stop(
        self, drain: bool = True, sleep: Callable[[float], None] = time.sleep
    ) -> bool:
        """Graceful shutdown: drain the queue within ``shutdown_timeout``
        (reference orchestrator.py:595-655 waits for the queue to empty
        or time out).

        Every queued task is either PROCESSED or LEFT IN THE QUEUE —
        never silently discarded: tasks whose retry backoff has not
        elapsed are waited for (sleep until the earliest ``not_before``,
        bounded by the deadline) rather than dropped, and the method
        returns False when any task remains unprocessed at the deadline
        so callers know the drain was incomplete. ``sleep`` is
        injectable for tests with a synthetic clock; if it fails to
        advance the clock, the loop exits rather than spinning."""
        self._stop = True
        if not drain:
            return not self._queue
        deadline = self.clock() + self.cfg["shutdown_timeout"]
        while self._queue:
            now = self.clock()
            if now >= deadline:
                break
            due = [t for t in self._queue if t.not_before <= now]
            if due:
                task = due[0]
                self._queue.remove(task)
                # a failure here re-queues with a future not_before via
                # _fail; the backoff wait below then applies to it
                self.process_task(task)
                continue
            target = min(min(t.not_before for t in self._queue), deadline)
            sleep(max(target - now, 0.0))
            if self.clock() <= now:  # non-advancing injected sleep
                break
        self.write_status()
        return not self._queue
