"""Task-graph orchestration variant: the engine's blue/green cycle
packaged as named tasks with per-task retry policy and a recorded run
journal.

This is the Spark-side counterpart of the reference's Prefect flows
(reference orchestrator_prefect.py:41-252): `check-neo4j-health`
(retries=0), `load-database` (retries=3, delay 2 s), `switch-alias`
(retries=2, delay 1 s), `check-is-latest`, `cleanup-old-databases`, and
the `process-snapshot` flow composing them — exists-check short-circuit,
health gate, load, latest-wins conditional cutover, keep-newest-N
cleanup. The semantics already live in ``streaming.orchestrator``; what
this module adds is the DAG-framework packaging: tasks as first-class
named units whose every attempt (state, timings, retries, error) is
recorded in a ``FlowRun`` journal — the observability surface the
reference gets from the Prefect UI, here as a JSON artifact instead of a
server dependency.

No Prefect (or any DAG framework) is imported: the task abstraction is
~60 lines, and everything below it reuses the engine's own primitives
(``discover_snapshots``, ``DeploymentCatalog``, pluggable ``load_fn``).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import SparkSession

from ..plans.catalog import DeploymentCatalog
from ..sources.snapshot import SnapshotRef, discover_snapshots, read_snapshot

# Per-task retry policy, mirroring the reference's decorators
# (orchestrator_prefect.py:41-46, 61-68, 87-92).
TASK_POLICIES: dict[str, dict[str, float]] = {
    "check-health": {"retries": 0, "retry_delay": 0.0},
    "load-database": {"retries": 3, "retry_delay": 2.0},
    "switch-alias": {"retries": 2, "retry_delay": 1.0},
    "check-is-latest": {"retries": 0, "retry_delay": 0.0},
    "cleanup-old-databases": {"retries": 0, "retry_delay": 0.0},
    "check-database-exists": {"retries": 0, "retry_delay": 0.0},
}


@dataclass
class TaskRun:
    """One task execution record (all attempts folded into it)."""

    task: str
    state: str = "pending"  # completed | failed | skipped
    attempts: int = 0
    started: float = 0.0
    finished: float = 0.0
    error: str | None = None
    result: Any = None

    def as_dict(self) -> dict[str, Any]:
        return {
            "task": self.task,
            "state": self.state,
            "attempts": self.attempts,
            "duration_sec": round(self.finished - self.started, 3),
            "error": self.error,
            "result": self.result,
        }


@dataclass
class FlowRun:
    """One flow execution: ordered task runs + terminal state. The JSON
    journal (``write_journal``) is the observability artifact — what the
    reference surfaces through the Prefect UI."""

    flow: str
    parameters: dict[str, Any] = field(default_factory=dict)
    task_runs: list[TaskRun] = field(default_factory=list)
    state: str = "running"  # completed | failed | skipped
    clock: Callable[[], float] = time.time
    sleep: Callable[[float], None] = time.sleep

    def run_task(
        self,
        name: str,
        fn: Callable[[], Any],
        *,
        retries: int | None = None,
        retry_delay: float | None = None,
    ) -> Any:
        """Execute ``fn`` under ``name``'s retry policy, recording every
        attempt. Raises the final exception after retries are exhausted
        (the flow decides whether that fails the whole run)."""
        policy = TASK_POLICIES.get(name, {})
        retries = int(policy.get("retries", 0)) if retries is None else retries
        retry_delay = (
            float(policy.get("retry_delay", 0.0))
            if retry_delay is None
            else retry_delay
        )
        run = TaskRun(task=name, started=self.clock())
        self.task_runs.append(run)
        while True:
            run.attempts += 1
            try:
                result = fn()
            except Exception as e:
                run.error = str(e)
                if run.attempts <= retries:
                    self.sleep(retry_delay)
                    continue
                run.state = "failed"
                run.finished = self.clock()
                raise
            run.state = "completed"
            run.error = None
            run.finished = self.clock()
            # journal only JSON-safe summaries, not DataFrames
            run.result = result if isinstance(result, (bool, int, float, str)) else None
            return result

    def as_dict(self) -> dict[str, Any]:
        return {
            "flow": self.flow,
            "state": self.state,
            "parameters": self.parameters,
            "task_runs": [t.as_dict() for t in self.task_runs],
        }

    def write_journal(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(self.as_dict(), indent=1) + "\n")


def _default_load(
    spark: SparkSession, ref: SnapshotRef, catalog: DeploymentCatalog
) -> None:
    nodes, edges = read_snapshot(spark, ref)
    catalog.register_deployment(
        ref.customer_id, ref.timestamp, nodes, edges, source_path=str(ref.path)
    )


def process_snapshot_flow(
    spark: SparkSession,
    ref: SnapshotRef,
    catalog: DeploymentCatalog,
    *,
    load_fn: Callable[[SparkSession, SnapshotRef, DeploymentCatalog], None] | None = None,
    health_fn: Callable[[], tuple[bool, str]] | None = None,
    keep_count: int = 2,
    journal_path: str | Path | None = None,
    clock: Callable[[], float] = time.time,
    sleep: Callable[[float], None] = time.sleep,
) -> FlowRun:
    """Process ONE snapshot as the reference's `process-snapshot` flow
    (orchestrator_prefect.py:197-252): exists-check short-circuit →
    health gate → load (retried per policy) → latest-wins check →
    conditional alias cutover → keep-newest-N cleanup. Returns the
    FlowRun; ``state`` is "skipped" when the deployment already exists,
    "failed" when the health gate or a retry-exhausted task fails."""
    flow = FlowRun(
        flow="process-snapshot",
        parameters={"customer_id": ref.customer_id, "timestamp": ref.timestamp},
        clock=clock,
        sleep=sleep,
    )
    db_name = f"{ref.customer_id}-{ref.timestamp}"
    try:
        exists = flow.run_task(
            "check-database-exists", lambda: catalog.database_exists(db_name)
        )
        if exists:
            # duplicate-load guard (reference flow step 0)
            flow.state = "skipped"
            return flow

        if health_fn is not None:
            healthy, reason = flow.run_task("check-health", health_fn)
            if not healthy:
                raise RuntimeError(f"health check failed: {reason}")

        flow.run_task(
            "load-database",
            lambda: (load_fn or _default_load)(spark, ref, catalog),
        )

        def is_latest() -> bool:
            prefix = f"{ref.customer_id}-"
            latest = max(
                (int(n.split("-")[-1]) for n in catalog.list_databases(prefix)),
                default=-1,
            )
            return ref.timestamp >= latest

        if flow.run_task("check-is-latest", is_latest):
            flow.run_task(
                "switch-alias",
                lambda: catalog.set_alias(ref.customer_id, ref.timestamp),
            )

        flow.run_task(
            "cleanup-old-databases",
            lambda: len(catalog.cleanup_old_deployments(ref.customer_id, keep_count)),
        )
        flow.state = "completed"
    except Exception as e:
        flow.state = "failed"
        flow.parameters["error"] = str(e)
    finally:
        if journal_path is not None:
            flow.write_journal(journal_path)
    return flow


def watch_flow(
    spark: SparkSession,
    data_path: str | Path,
    catalog: DeploymentCatalog,
    *,
    journal_dir: str | Path | None = None,
    **flow_kwargs: Any,
) -> list[FlowRun]:
    """One scan-and-process pass of the reference's `watch-for-snapshots`
    flow (orchestrator_prefect.py:355-430): discover complete snapshots,
    run ``process_snapshot_flow`` for each not-yet-deployed one —
    sequentially, the reference's max_concurrent_loads=1 default. Call
    repeatedly (or from a scheduler) for the continuous behavior; the
    catalog existence check makes re-scans idempotent. Returns the
    FlowRuns of this pass (skipped ones included, mirroring the
    reference's skip records)."""
    runs: list[FlowRun] = []
    for ref in discover_snapshots(data_path):
        journal = (
            Path(journal_dir) / f"{ref.customer_id}-{ref.timestamp}.json"
            if journal_dir is not None
            else None
        )
        runs.append(
            process_snapshot_flow(
                spark, ref, catalog, journal_path=journal, **flow_kwargs
            )
        )
    return runs
