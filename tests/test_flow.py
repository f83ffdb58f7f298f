"""Task-graph flow variant (streaming/flow.py): the reference's Prefect
flow semantics — per-task retry policies, exists-check short-circuit,
health gate, latest-wins conditional cutover, keep-2 cleanup, and the
recorded task-run journal (reference orchestrator_prefect.py:41-252)."""

from __future__ import annotations

import json

import pytest

from neo4j_blue_green_arrow_etl_spark import fixtures as FX
from neo4j_blue_green_arrow_etl_spark.plans.catalog import DeploymentCatalog
from neo4j_blue_green_arrow_etl_spark.sources.snapshot import discover_snapshots
from neo4j_blue_green_arrow_etl_spark.streaming.flow import (
    FlowRun,
    process_snapshot_flow,
    watch_flow,
)


@pytest.fixture()
def base(spark, sf_dir, tmp_path):
    b = str(tmp_path / "data")
    FX.materialize_snapshot(spark, sf_dir, b, "cust1", 100)
    FX.materialize_snapshot(spark, sf_dir, b, "cust1", 200)
    return b


def _catalog(spark, tmp_path):
    return DeploymentCatalog(spark, tmp_path / "catalog.json")


def test_flow_processes_snapshot_end_to_end(spark, base, tmp_path):
    cat = _catalog(spark, tmp_path)
    ref = discover_snapshots(base)[0]
    run = process_snapshot_flow(spark, ref, cat, journal_path=tmp_path / "j.json")
    assert run.state == "completed"
    assert [t.task for t in run.task_runs] == [
        "check-database-exists",
        "load-database",
        "check-is-latest",
        "switch-alias",
        "cleanup-old-databases",
    ]
    assert all(t.state == "completed" for t in run.task_runs)
    assert cat.alias_target("cust1") == "cust1-100"
    journal = json.loads((tmp_path / "j.json").read_text())
    assert journal["state"] == "completed"
    assert journal["task_runs"][1]["task"] == "load-database"
    assert journal["task_runs"][1]["attempts"] == 1


def test_flow_skips_existing_deployment(spark, base, tmp_path):
    cat = _catalog(spark, tmp_path)
    ref = discover_snapshots(base)[0]
    assert process_snapshot_flow(spark, ref, cat).state == "completed"
    rerun = process_snapshot_flow(spark, ref, cat)
    assert rerun.state == "skipped"
    assert [t.task for t in rerun.task_runs] == ["check-database-exists"]


def test_load_retry_policy_retries_then_succeeds(spark, base, tmp_path):
    """load-database carries retries=3 / delay 2 s (reference
    orchestrator_prefect.py:61-68); two transient failures must be
    absorbed, the attempts and injected sleeps recorded."""
    cat = _catalog(spark, tmp_path)
    ref = discover_snapshots(base)[0]
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky_load(spark_, ref_, cat_):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        cat_.register_deployment(
            ref_.customer_id,
            ref_.timestamp,
            *__import__(
                "neo4j_blue_green_arrow_etl_spark.sources.snapshot",
                fromlist=["read_snapshot"],
            ).read_snapshot(spark_, ref_),
            source_path=str(ref_.path),
        )

    run = process_snapshot_flow(
        spark, ref, cat, load_fn=flaky_load, sleep=sleeps.append
    )
    assert run.state == "completed"
    load_run = next(t for t in run.task_runs if t.task == "load-database")
    assert load_run.attempts == 3
    assert load_run.state == "completed"
    assert sleeps == [2.0, 2.0]


def test_retry_exhaustion_fails_flow_with_error_recorded(spark, base, tmp_path):
    cat = _catalog(spark, tmp_path)
    ref = discover_snapshots(base)[0]

    def always_fails(*a):
        raise ConnectionError("server gone")

    sleeps: list[float] = []
    run = process_snapshot_flow(
        spark, ref, cat, load_fn=always_fails, sleep=sleeps.append
    )
    assert run.state == "failed"
    load_run = next(t for t in run.task_runs if t.task == "load-database")
    assert load_run.state == "failed"
    assert load_run.attempts == 4  # 1 initial + 3 retries
    assert "server gone" in load_run.error
    assert len(sleeps) == 3
    assert cat.alias_target("cust1") is None  # no cutover on failure


def test_health_gate_blocks_load(spark, base, tmp_path):
    cat = _catalog(spark, tmp_path)
    ref = discover_snapshots(base)[0]
    run = process_snapshot_flow(
        spark, ref, cat, health_fn=lambda: (False, "heap 95%")
    )
    assert run.state == "failed"
    assert "heap 95%" in run.parameters["error"]
    assert not any(t.task == "load-database" for t in run.task_runs)


def test_latest_wins_cutover_and_keep2_cleanup(spark, sf_dir, base, tmp_path):
    """Processing newest first: the older snapshot still loads but must
    NOT capture the alias; a third load triggers keep-2 cleanup."""
    cat = _catalog(spark, tmp_path)
    refs = sorted(discover_snapshots(base), key=lambda r: -r.timestamp)
    assert process_snapshot_flow(spark, refs[0], cat).state == "completed"
    assert cat.alias_target("cust1") == "cust1-200"
    older = process_snapshot_flow(spark, refs[1], cat)
    assert older.state == "completed"
    assert not any(t.task == "switch-alias" for t in older.task_runs)
    assert cat.alias_target("cust1") == "cust1-200"

    FX.materialize_snapshot(spark, sf_dir, base, "cust1", 300)
    newest = discover_snapshots(base)
    ref300 = next(r for r in newest if r.timestamp == 300)
    run = process_snapshot_flow(spark, ref300, cat)
    assert run.state == "completed"
    assert cat.alias_target("cust1") == "cust1-300"
    cleanup = next(t for t in run.task_runs if t.task == "cleanup-old-databases")
    assert cleanup.result == 1  # cust1-100 dropped, newest 2 kept
    assert cat.list_databases("cust1-") == ["cust1-200", "cust1-300"]


def test_watch_flow_scan_is_idempotent(spark, base, tmp_path):
    cat = _catalog(spark, tmp_path)
    runs = watch_flow(spark, base, cat, journal_dir=tmp_path / "journals")
    assert [r.state for r in runs] == ["completed", "completed"]
    assert len(list((tmp_path / "journals").glob("*.json"))) == 2
    rescan = watch_flow(spark, base, cat)
    assert [r.state for r in rescan] == ["skipped", "skipped"]


def test_flowrun_journal_is_json_safe(tmp_path):
    """DataFrames and other non-scalar results must not leak into the
    journal (they are not JSON-serializable)."""
    flow = FlowRun(flow="t", sleep=lambda _: None)
    flow.run_task("check-is-latest", lambda: object())
    flow.write_journal(tmp_path / "j.json")
    data = json.loads((tmp_path / "j.json").read_text())
    assert data["task_runs"][0]["result"] is None
