"""Dump .explain('formatted') for a list of queries into plans/r<N>/
as <query>_<tag>.txt — the before/after plan evidence an optimization
round commits (judge checks plan claims against these files).

Usage: python tools/dump_round_plans.py <round> <tag> q_a1 q_j5 ...

Streaming-fold queries (q_st6/q_st8/...) EXECUTE their driver-side loop
on DataFrame construction; their returned frame's plan is still the
final read, which is what gets dumped (the per-batch plans live in the
operator docstrings / PLANSTATS).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    rnd, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("dump-round-plans")
    out_dir = REPO / "plans" / f"r{rnd}"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        spark.catalog.clearCache()
        print(f"wrote plans/r{rnd}/{name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
