"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [--out FILE.json] [sf_dir] [query ...]

With --out, also writes a machine-readable artifact
{name: {"status": "pass"|"rows_only"|"fail", "rows": N, "secs": s,
"detail": ...}} so the full-registry sweep is durable in git even though
the driver's per-round CORRECTNESS file caps at 50 rows.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neo4j_blue_green_arrow_etl_spark import WAREHOUSE_TABLES

TABLES = list(WAREHOUSE_TABLES)


def canon(rows, columns) -> str:
    """Order-insensitive canonical hash: sort columns by name, render
    every value to a normalized string, sort rows, sha256."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def render(v):
        import datetime
        import decimal

        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, decimal.Decimal):
            v = float(v)  # normalize with the float path below
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return f"{v:.6f}".rstrip("0").rstrip(".")
        if isinstance(v, datetime.datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, datetime.date):
            return v.isoformat()
        return str(v)

    lines = sorted("\x01".join(render(r[i]) for i in idx) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: check_correctness.py [--out FILE.json] [sf_dir] [query ...]")
            return 2
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    report: dict[str, dict] = {}
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            report[name] = {
                "status": "fail",
                "rows": None,
                "secs": round(time.time() - t0, 2),
                "detail": f"spark error: {e}"[:300],
            }
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            report[name] = {
                "status": "rows_only",
                "rows": len(srows),
                "secs": round(time.time() - t0, 2),
                "detail": "no oracle by design; recall asserted in pytest",
                # canonical hash of the Spark result: lets a later round
                # diff sweeps without re-running (hash-seeded queries
                # are deterministic per sf_dir, just not SQL-expressible)
                "hash": canon(srows, scols),
            }
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            report[name] = {
                "status": "fail",
                "rows": len(srows),
                "secs": round(time.time() - t0, 2),
                "detail": f"oracle error: {e}"[:300],
            }
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={scols} oracle={ocols}")
        hs = None
        if not problems:
            hs, ho = canon(srows, scols), canon(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                for i, (a, b) in enumerate(zip(sorted(map(str, srows)), sorted(map(str, orows)))):
                    if a != b:
                        problems.append(f"first diff row {i}: spark={a} oracle={b}")
                        break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures.append(name)
            report[name] = {
                "status": "fail",
                "rows": len(srows),
                "secs": round(time.time() - t0, 2),
                "detail": "; ".join(problems)[:300],
            }
        else:
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            report[name] = {
                "status": "pass",
                "rows": len(srows),
                "secs": round(time.time() - t0, 2),
                "detail": None,
                # canonical value hash (identical for spark and oracle
                # on a pass): lets the next judge diff rounds without
                # re-running Spark (VERDICT r5 task 8)
                "hash": hs,
            }
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if out_path:
        summary = {
            "sf_dir": sf_dir,
            "total": len(report),
            "pass": sum(1 for r in report.values() if r["status"] == "pass"),
            "rows_only": sum(1 for r in report.values() if r["status"] == "rows_only"),
            "fail": len(failures),
        }
        Path(out_path).write_text(
            json.dumps({"summary": summary, "queries": report}, indent=1) + "\n"
        )
        print(f"wrote {out_path}: {summary}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
