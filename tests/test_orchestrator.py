from __future__ import annotations

import json

import pytest

from neo4j_blue_green_arrow_etl_spark import fixtures as FX
from neo4j_blue_green_arrow_etl_spark.plans.catalog import DeploymentCatalog
from neo4j_blue_green_arrow_etl_spark.streaming import Orchestrator


@pytest.fixture()
def data_base(spark, sf_dir, tmp_path):
    base = str(tmp_path / "data")
    FX.materialize_snapshot(spark, sf_dir, base, "customer1", 1767741427)
    return base


def make_orch(spark, base, tmp_path, **cfg):
    catalog = DeploymentCatalog(spark, tmp_path / "catalog.json")
    return Orchestrator(
        spark,
        base,
        catalog=catalog,
        config={"orchestrator": cfg} if cfg else None,
        status_path=tmp_path / "status.json",
    )


def test_end_to_end_discover_load_switch(spark, sf_dir, data_base, tmp_path):
    orch = make_orch(spark, data_base, tmp_path)
    orch.run_cycle()
    assert orch.stats.completed == 1
    assert orch.catalog.alias_target("customer1") == "customer1-1767741427"
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    n_suppliers = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert orch.catalog.count_via_alias("customer1") == n_customers + n_suppliers


def test_late_snapshot_loads_but_does_not_capture_alias(
    spark, sf_dir, data_base, tmp_path
):
    """ST3: a snapshot with an OLDER timestamp still loads, but the alias
    stays on the newest deployment (reference orchestrator.py:322-324)."""
    orch = make_orch(spark, data_base, tmp_path)
    orch.run_cycle()
    # late-arriving OLDER snapshot
    FX.materialize_snapshot(spark, sf_dir, data_base, "customer1", 1767741000)
    orch.run_cycle()
    assert orch.stats.completed == 2
    assert orch.catalog.database_exists("customer1-1767741000")  # loaded
    assert orch.catalog.alias_target("customer1") == "customer1-1767741427"  # not switched

    # and a NEWER one does capture the alias
    FX.materialize_snapshot(spark, sf_dir, data_base, "customer1", 1767742000)
    orch.run_cycle()
    assert orch.catalog.alias_target("customer1") == "customer1-1767742000"


def test_dedup_same_snapshot_not_reprocessed(spark, data_base, tmp_path):
    orch = make_orch(spark, data_base, tmp_path)
    orch.run_cycle()
    orch.run_cycle()  # same tree scanned again
    assert orch.stats.completed == 1
    assert orch.stats.discovered == 1


def test_retry_with_backoff_then_success(spark, data_base, tmp_path):
    fake_now = [1000.0]
    attempts = []

    def flaky_load(spark_, ref, catalog):
        attempts.append(ref.database)
        if len(attempts) < 3:
            raise RuntimeError("transient sink failure")
        Orchestrator._default_load(spark_, ref, catalog)

    catalog = DeploymentCatalog(spark, tmp_path / "catalog.json")
    orch = Orchestrator(
        spark,
        data_base,
        catalog=catalog,
        config={"orchestrator": {"max_retries": 3, "retry_backoff_base": 2}},
        status_path=tmp_path / "status.json",
        load_fn=flaky_load,
        clock=lambda: fake_now[0],
    )
    orch.run_cycle()  # attempt 1 fails -> requeued at now+2
    assert orch.stats.retried == 1 and orch.stats.completed == 0
    orch.run_cycle()  # not due yet: backoff holds the task
    assert len(attempts) == 1
    fake_now[0] += 2.1
    orch.run_cycle()  # attempt 2 fails -> backoff 4
    assert len(attempts) == 2
    fake_now[0] += 4.1
    orch.run_cycle()  # attempt 3 succeeds
    assert orch.stats.completed == 1
    assert orch.catalog.database_exists("customer1-1767741427")


def test_retries_exhausted_marks_failed(spark, data_base, tmp_path):
    fake_now = [1000.0]

    def always_fail(spark_, ref, catalog):
        raise RuntimeError("permanent failure")

    orch = Orchestrator(
        spark,
        data_base,
        catalog=DeploymentCatalog(spark, tmp_path / "catalog.json"),
        config={"orchestrator": {"max_retries": 2, "retry_backoff_base": 2}},
        load_fn=always_fail,
        clock=lambda: fake_now[0],
    )
    for _ in range(5):
        orch.run_cycle()
        fake_now[0] += 10
    assert orch.stats.failed == 1
    assert orch.stats.completed == 0


def test_health_gate_defers_without_consuming_retries(spark, data_base, tmp_path):
    """A health-gate failure re-queues the task with backoff WITHOUT
    incrementing retry_count — sustained pressure must never permanently
    fail a snapshot (reference orchestrator.py:310-316 re-queues without
    counting). When the pressure clears, the task loads normally."""
    fake_now = [1000.0]
    orch = make_orch(spark, data_base, tmp_path, max_databases=0, max_retries=0)
    orch.clock = lambda: fake_now[0]
    for _ in range(5):  # way past max_retries=0
        orch.run_cycle()
        fake_now[0] += 10
    assert orch.stats.failed == 0
    assert orch.stats.completed == 0
    assert orch.stats.health_deferred == 5
    assert len(orch._queue) == 1
    assert orch._queue[0].retry_count == 0
    orch.cfg["max_databases"] = 50  # pressure clears
    fake_now[0] += 10
    orch.run_cycle()
    assert orch.stats.completed == 1


def test_heap_gate_blocks_and_recovers(spark, data_base, tmp_path):
    """ST7/C8: the JVM-heap admission gate (reference orchestrator.py:
    111-152, queryJmx heap < 85%) with an injected metrics provider."""
    heap = [0.95]
    orch = Orchestrator(
        spark,
        data_base,
        catalog=DeploymentCatalog(spark, tmp_path / "catalog.json"),
        status_path=tmp_path / "status.json",
        heap_fraction_fn=lambda: heap[0],
    )
    ok, reason = orch.check_health()
    assert not ok and "heap 95%" in reason
    orch.run_cycle()
    assert orch.stats.completed == 0 and orch.stats.health_deferred == 1
    heap[0] = 0.30
    ok, _ = orch.check_health()
    assert ok


def test_default_heap_provider_reads_real_jvm(spark, data_base, tmp_path):
    orch = make_orch(spark, data_base, tmp_path)
    frac = orch._jvm_heap_fraction()
    assert 0.0 < frac < 1.0


def test_cleanup_retention_via_orchestrator(spark, sf_dir, data_base, tmp_path):
    orch = make_orch(spark, data_base, tmp_path, keep_count=2)
    for ts in (1767741500, 1767741600, 1767741700):
        FX.materialize_snapshot(spark, sf_dir, data_base, "customer1", ts)
    for _ in range(4):
        orch.run_cycle()
    assert orch.stats.completed == 4
    kept = orch.catalog.list_databases("customer1-")
    assert kept == ["customer1-1767741600", "customer1-1767741700"]
    assert orch.catalog.alias_target("customer1") == "customer1-1767741700"


def test_status_file_written(spark, data_base, tmp_path):
    orch = make_orch(spark, data_base, tmp_path)
    orch.run_cycle()
    status = json.loads((tmp_path / "status.json").read_text())
    assert status["completed"] == 1
    assert status["aliases"] == {"customer1": "customer1-1767741427"}
    assert status["queue_size"] == 0


def test_graceful_drain(spark, sf_dir, data_base, tmp_path):
    orch = make_orch(spark, data_base, tmp_path, max_concurrent_loads=1)
    FX.materialize_snapshot(spark, sf_dir, data_base, "customer2", 1767741427)
    orch.scan_once()
    assert len(orch._queue) == 2
    assert orch.stop(drain=True) is True
    assert orch.stats.completed == 2


def test_drain_waits_for_backoff_tasks_instead_of_dropping(
    spark, data_base, tmp_path
):
    """stop(drain=True) must process tasks whose retry backoff has not
    elapsed yet — sleeping until their not_before — rather than popping
    and silently discarding them (the reference shutdown waits for the
    queue to empty, orchestrator.py:595-655)."""
    fake_now = [1000.0]
    attempts = []

    def flaky_load(spark_, ref, catalog):
        attempts.append(fake_now[0])
        if len(attempts) < 2:
            raise RuntimeError("transient")
        Orchestrator._default_load(spark_, ref, catalog)

    orch = Orchestrator(
        spark,
        data_base,
        catalog=DeploymentCatalog(spark, tmp_path / "catalog.json"),
        config={"orchestrator": {"max_retries": 3, "retry_backoff_base": 2, "shutdown_timeout": 300}},
        load_fn=flaky_load,
        clock=lambda: fake_now[0],
    )
    orch.run_cycle()  # attempt 1 fails -> requeued with not_before in the future
    assert len(orch._queue) == 1
    assert orch._queue[0].not_before > fake_now[0]

    def advancing_sleep(s):
        fake_now[0] += s

    assert orch.stop(drain=True, sleep=advancing_sleep) is True
    assert orch.stats.completed == 1
    assert not orch._queue
    assert attempts[1] >= 1002.0  # waited for the backoff, then retried


def test_drain_returns_false_when_deadline_leaves_tasks(spark, data_base, tmp_path):
    """An incomplete drain must say so: tasks remaining at the deadline
    stay in the queue and stop() returns False."""
    fake_now = [1000.0]

    def always_fail(spark_, ref, catalog):
        raise RuntimeError("permanent")

    orch = Orchestrator(
        spark,
        data_base,
        catalog=DeploymentCatalog(spark, tmp_path / "catalog.json"),
        config={"orchestrator": {"max_retries": 100, "retry_backoff_base": 10, "shutdown_timeout": 15}},
        load_fn=always_fail,
        clock=lambda: fake_now[0],
    )
    orch.scan_once()

    def advancing_sleep(s):
        fake_now[0] += s

    assert orch.stop(drain=True, sleep=advancing_sleep) is False
    assert len(orch._queue) == 1  # still queued, not silently dropped


def test_drain_with_non_advancing_sleep_terminates(spark, data_base, tmp_path):
    """A pathological injected sleep that does not advance the clock
    must not spin stop() forever."""
    fake_now = [1000.0]

    def always_fail(spark_, ref, catalog):
        raise RuntimeError("permanent")

    orch = Orchestrator(
        spark,
        data_base,
        catalog=DeploymentCatalog(spark, tmp_path / "catalog.json"),
        config={"orchestrator": {"max_retries": 5, "retry_backoff_base": 2, "shutdown_timeout": 300}},
        load_fn=always_fail,
        clock=lambda: fake_now[0],
    )
    orch.scan_once()
    assert orch.stop(drain=True, sleep=lambda s: None) is False


def test_restarted_orchestrator_skips_deployed_snapshots(
    spark, sf_dir, data_base, tmp_path
):
    """ST2 across restarts: a NEW orchestrator over a catalog restored
    from the manifest (views wiped, as after a session restart) must
    not reload snapshots that are already deployed — the Prefect
    variant's catalog existence check (orchestrator_prefect.py:339-345)."""
    orch = make_orch(spark, data_base, tmp_path)
    assert orch.run_cycle() == 1
    assert orch.catalog.count_via_alias("customer1") > 0

    for v in spark.catalog.listTables():  # simulate restart
        if v.isTemporary:
            spark.catalog.dropTempView(v.name)
    cat2 = DeploymentCatalog(spark, tmp_path / "catalog.json")
    orch2 = Orchestrator(spark, data_base, catalog=cat2, status_path=tmp_path / "s2.json")
    assert orch2.run_cycle() == 0
    assert orch2.stats.skipped_existing == 1
    assert orch2.stats.completed == 0
    # and the restored deployment still answers the consumer contract
    assert cat2.count_via_alias("customer1") > 0


def test_multi_customer_isolation(spark, sf_dir, tmp_path):
    """Two customers' snapshots interleave through one orchestrator:
    aliases, retention, and latest-wins stay per-customer."""
    base = str(tmp_path / "data")
    for cust, ts_list in {"acme": (100, 300), "globex": (200,)}.items():
        for ts in ts_list:
            FX.materialize_snapshot(spark, sf_dir, base, cust, ts)
    orch = make_orch(spark, base, tmp_path, max_concurrent_loads=2)
    for _ in range(3):
        orch.run_cycle()
    cat = orch.catalog
    assert cat.alias_target("acme") == "acme-300"
    assert cat.alias_target("globex") == "globex-200"
    # a newer globex snapshot must not disturb acme's alias
    FX.materialize_snapshot(spark, sf_dir, base, "globex", 400)
    orch.run_cycle()
    assert cat.alias_target("acme") == "acme-300"
    assert cat.alias_target("globex") == "globex-400"
    assert set(cat.list_databases("acme-")) == {"acme-100", "acme-300"}
    assert set(cat.list_databases("globex-")) == {"globex-200", "globex-400"}


def test_concurrency_cap_respected(spark, sf_dir, tmp_path):
    """max_concurrent_loads bounds the per-cycle load count (ST5)."""
    base = str(tmp_path / "data")
    for ts in (1, 2, 3, 4, 5):
        FX.materialize_snapshot(spark, sf_dir, base, "acme", ts)
    orch = make_orch(spark, base, tmp_path, max_concurrent_loads=2)
    assert orch.run_cycle() == 2
    assert orch.run_cycle() == 2
    assert orch.run_cycle() == 1


# ---------------------------------------------------------------------------
# Structured-Streaming orchestrate mode (run_streaming)
# ---------------------------------------------------------------------------


def _stream_drain(orch, ckpt):
    q = orch.run_streaming(ckpt)
    q.awaitTermination(180)
    q.stop()


def test_streaming_orchestrate_loads_and_switches(spark, sf_dir, tmp_path):
    """availableNow drain over the snapshotarrivals source: both
    snapshots load, the alias lands on the max timestamp, retention
    keeps newest 2, and stats/status report the work (ST1-ST9 on real
    Structured Streaming)."""
    base = str(tmp_path / "data")
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 100)
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 300)
    orch = make_orch(spark, base, tmp_path)
    _stream_drain(orch, str(tmp_path / "ckpt"))
    assert orch.stats.discovered == 2
    assert orch.stats.completed == 2
    assert orch.catalog.alias_target("acme").endswith("-300")
    status = json.loads((tmp_path / "status.json").read_text())
    assert status["completed"] == 2 and status["queue_size"] == 0


def test_streaming_orchestrate_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """A fresh orchestrator over the SAME checkpoint re-discovers
    nothing (the offset log carries ST2 dedup across restarts); a late
    OLDER snapshot then loads without moving the alias (ST3)."""
    base = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 300)
    orch1 = make_orch(spark, base, tmp_path)
    _stream_drain(orch1, ckpt)
    assert orch1.stats.completed == 1

    # restart: new orchestrator instance, same checkpoint + catalog
    orch2 = make_orch(spark, base, tmp_path)
    _stream_drain(orch2, ckpt)
    assert orch2.stats.discovered == 0
    assert orch2.stats.completed == 0

    # late OLDER snapshot: loads, alias stays on 300
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 200)
    orch3 = make_orch(spark, base, tmp_path)
    _stream_drain(orch3, ckpt)
    assert orch3.stats.completed == 1
    assert orch3.catalog.alias_target("acme").endswith("-300")
