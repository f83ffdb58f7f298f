"""CLI parity with the reference's scripts/ tools.

Reference command                      -> this CLI
  load_with_aliases.py --customer C \
      --timestamp T [--no-switch]      -> load --customer C --timestamp T
  orchestrator.py                      -> orchestrate [--cycles N]
  manage_aliases.py list|create|drop   -> aliases [--set C T | --drop C]
  (SHOW DATABASES, C1-C3)              -> databases [--prefix P]
  simulate_snapshot.py                 -> simulate --customer C --source-ts A --new-ts B
  docs/ALIASES.md count contract (C9)  -> count --customer C [--kind edges]

State persists across invocations via the manifest (``--manifest``,
default ``{base}/manifest.json``) — the catalog rebuilds deployment
views from recorded snapshot paths on every start (crash recovery),
so ``load`` in one process and ``count`` in another just work.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path


def _catalog(args):
    from .plans.catalog import DeploymentCatalog
    from .session import get_spark

    spark = get_spark("neo4j_blue_green_arrow_etl_spark-cli")
    manifest = args.manifest or str(Path(args.base) / "manifest.json")
    return spark, DeploymentCatalog(spark, manifest)


def cmd_load(args) -> int:
    from .sources.snapshot import SnapshotRef, read_snapshot

    spark, cat = _catalog(args)
    path = Path(args.base) / args.customer / str(args.timestamp)
    if not path.exists():
        print(f"error: snapshot path {path} does not exist", file=sys.stderr)
        return 1
    ref = SnapshotRef(args.customer, args.timestamp, str(path))
    t0 = time.time()
    nodes, edges = read_snapshot(spark, ref)
    cat.register_deployment(
        args.customer, args.timestamp, nodes, edges, source_path=str(path)
    )
    n, e = nodes.count(), edges.count()
    secs = time.time() - t0
    print(
        f"loaded {ref.database}: {n} nodes, {e} edges in {secs:.1f}s "
        f"({(n + e) / max(secs, 1e-9):,.0f} rows/s)"
    )
    if not args.no_switch:
        cat.set_alias(args.customer, args.timestamp)
        print(f"alias {args.customer} -> {ref.database}")
    return 0


def cmd_orchestrate(args) -> int:
    from .streaming.orchestrator import Orchestrator

    spark, cat = _catalog(args)
    orch = Orchestrator(
        spark,
        args.base,
        catalog=cat,
        status_path=Path(args.base) / "status.json",
    )
    if args.cycles:
        for _ in range(args.cycles):
            orch.run_cycle()
    else:
        orch.run()  # until interrupted (30 s scan interval, ST1)
    print(json.dumps(orch.stats.as_dict(), indent=2))
    return 0


def cmd_aliases(args) -> int:
    spark, cat = _catalog(args)
    if args.set:
        customer, ts = args.set
        cat.set_alias(customer, int(ts))
        print(f"alias {customer} -> {customer}-{ts}")
    elif args.drop:
        cat.drop_alias(args.drop)
        print(f"dropped alias {args.drop}")
    for customer, db in sorted(cat.list_aliases().items()):
        print(f"{customer} -> {db}")
    return 0


def cmd_databases(args) -> int:
    spark, cat = _catalog(args)
    for name in cat.list_databases(prefix=args.prefix):
        print(name)
    return 0


def cmd_simulate(args) -> int:
    src = Path(args.base) / args.customer / str(args.source_ts)
    ts = args.new_ts or int(time.time())
    dst = Path(args.base) / args.customer / str(ts)
    if not src.exists():
        print(f"error: source snapshot {src} does not exist", file=sys.stderr)
        return 1
    if dst.exists():
        print(f"error: target snapshot {dst} already exists", file=sys.stderr)
        return 1
    shutil.copytree(src, dst)
    print(f"simulated snapshot {args.customer}/{ts} (copied from {args.source_ts})")
    return 0


def cmd_count(args) -> int:
    spark, cat = _catalog(args)
    print(cat.count_via_alias(args.customer, args.kind))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m neo4j_blue_green_arrow_etl_spark",
        description="Blue/green property-graph snapshot engine (PySpark)",
    )
    p.add_argument("--base", default="data", help="snapshot base directory")
    p.add_argument("--manifest", default=None, help="catalog manifest path")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("load", help="load one snapshot and switch its alias")
    sp.add_argument("--customer", required=True)
    sp.add_argument("--timestamp", type=int, required=True)
    sp.add_argument("--no-switch", action="store_true")
    sp.set_defaults(fn=cmd_load)

    sp = sub.add_parser("orchestrate", help="run the discovery/load loop")
    sp.add_argument("--cycles", type=int, default=0, help="0 = run forever")
    sp.set_defaults(fn=cmd_orchestrate)

    sp = sub.add_parser("aliases", help="list/set/drop aliases")
    sp.add_argument("--set", nargs=2, metavar=("CUSTOMER", "TS"))
    sp.add_argument("--drop", metavar="CUSTOMER")
    sp.set_defaults(fn=cmd_aliases)

    sp = sub.add_parser("databases", help="list deployments")
    sp.add_argument("--prefix", default=None)
    sp.set_defaults(fn=cmd_databases)

    sp = sub.add_parser("simulate", help="copy a snapshot to a new timestamp")
    sp.add_argument("--customer", required=True)
    sp.add_argument("--source-ts", type=int, required=True)
    sp.add_argument("--new-ts", type=int, default=None)
    sp.set_defaults(fn=cmd_simulate)

    sp = sub.add_parser("count", help="count nodes/edges via a customer alias")
    sp.add_argument("--customer", required=True)
    sp.add_argument("--kind", choices=("nodes", "edges"), default="nodes")
    sp.set_defaults(fn=cmd_count)

    args = p.parse_args(argv)
    from .errors import EngineError

    try:
        return args.fn(args)
    except EngineError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
