"""Guards on the driver contract (__spark_entry__): the one interface
the external harness calls. A regression here invalidates every other
green signal, so the shape is pinned explicitly."""

from __future__ import annotations

from pyspark.sql import DataFrame

import __spark_entry__ as entrymod
from neo4j_blue_green_arrow_etl_spark import WAREHOUSE_TABLES

# Hash-seeded approximate queries with no SQL-expressible oracle.
# A driver-window rotation alias inherits its target's oracle,
# including its absence — the r11 window re-gates the changed sim
# family, so those aliases join the oracle-less set dynamically in
# test_queries_and_oracles_are_consistent.
ROWS_ONLY = {
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_sim_lsh",
    "q_sim_ivf",
    "q_sim_pq",
    "q_sim_ivfpq",
}


def test_entry_returns_nonempty_stable_dataframe(spark):
    df = entrymod.entry(spark)
    assert isinstance(df, DataFrame)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["l_returnflag", "l_linestatus", "sum_qty", "sum_price", "cnt"]


def test_queries_and_oracles_are_consistent(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    # every oracle belongs to a registered query
    assert set(os_) <= set(qs)
    # the only queries without oracles are the declared rows-only set
    # plus any rotation alias of a rows-only target
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    expected = ROWS_ONLY | {
        n
        for n, spec in REGISTRY.items()
        if spec.alias_of in ROWS_ONLY
    }
    assert set(qs) - set(os_) == expected
    # names are stable identifiers (driver uses them as dict keys/files)
    for name in qs:
        assert name.startswith("q_") and name.replace("_", "").isalnum()
    # every callable is lazy: building the DataFrame must not collect
    sample = sorted(qs)[:3]
    for name in sample:
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert isinstance(df, DataFrame)


def test_oracles_are_runnable_duckdb_sql():
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in WAREHOUSE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    # every oracle must at least PREPARE (parse + bind) in DuckDB
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle for {name} failed to plan: {ex}") from ex


def test_no_oracle_emits_hugeint():
    """VERDICT r3 task 1: DuckDB's SUM(<int>) returns HUGEINT, which the
    driver's arrow/pandas compare renders as float64 and hash-mismatches
    against Spark's BIGINT even when values are identical. Every oracle
    must therefore CAST aggregate integer columns so no result column is
    HUGEINT/INT128 — checked here by binding each oracle (LIMIT 0) and
    inspecting the result schema."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in WAREHOUSE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emitting HUGEINT columns: {offenders}"


def test_oracle_outputs_are_atomic():
    """VERDICT r11 task 1: the driver's pandas canonicalizer sorts every
    output column and crashes on non-atomic cells (unhashable list —
    q_x12_quant's raw array<int> was r11's one red driver row). Contract:
    every oracle-gated query's result schema holds only atomic columns.
    Binding the ORACLE (LIMIT 0) suffices: a Spark output that went
    non-atomic while its oracle stayed atomic fails the sweep's
    schema/hash match first, so this test plus a green sweep covers both
    sides. Flatten arrays with array_join/array_to_string (q_p1, q_x12)."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in WAREHOUSE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if any(k in str(t).upper() for k in ("[]", "STRUCT", "MAP", "LIST"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle-gated queries with non-atomic output columns (the driver "
        f"canonicalizer cannot sort these): {offenders}"
    )


def test_local_sweep_artifact_covers_entire_registry():
    """VERDICT r2 task 1: the driver's CORRECTNESS file caps at 50 rows,
    so the full-registry evidence lives in the committed
    CORRECTNESS_LOCAL_r*.json (tools/check_correctness.py --out). Guard:
    the latest artifact exists, covers EVERY registered query, and
    records zero failures — a stale or partial sweep fails this test."""
    import json
    from pathlib import Path

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    repo = Path(__file__).resolve().parent.parent
    # sort by the NUMERIC round suffix: lexicographic order would pick
    # r9 over r10 once rounds reach double digits
    artifacts = sorted(
        repo.glob("CORRECTNESS_LOCAL_r*.json"),
        key=lambda p: int(p.stem.rsplit("_r", 1)[1]),
    )
    assert artifacts, "no committed CORRECTNESS_LOCAL_r*.json sweep artifact"
    data = json.loads(artifacts[-1].read_text())
    queries = data["queries"]
    missing = sorted(set(REGISTRY) - set(queries))
    assert not missing, f"sweep artifact missing registry queries: {missing}"
    failed = sorted(n for n, r in queries.items() if r["status"] == "fail")
    assert not failed, f"sweep artifact records failures: {failed}"
    assert data["summary"]["fail"] == 0


def test_driver_rotation_targets_all_resolve():
    """Every driver-window rotation alias must resolve to a live
    registry query: a renamed/removed target degrades to an import
    warning (so the package still imports) and THIS test is where the
    failure surfaces loudly."""
    from neo4j_blue_green_arrow_etl_spark.operators import (
        _DRIVER_ROTATION,
        REGISTRY,
    )

    missing = {
        alias: target
        for alias, target in _DRIVER_ROTATION.items()
        if target not in REGISTRY or alias not in REGISTRY
    }
    assert not missing, f"rotation aliases with dead targets: {missing}"
    for alias, target in _DRIVER_ROTATION.items():
        assert REGISTRY[alias].alias_of == target
        assert REGISTRY[alias].spark is REGISTRY[target].spark
