"""Normalized round-over-round bench comparison.

Usage: python tools/bench_compare.py OLD.json NEW.json [--bar 1.2]
       [--old-noise F] [--top N]

Each side is a bench.py artifact (SPARK_GRAFT_BENCH_OUT payload). Every
per-query time is divided by its run's noise_factor (the interleaved
pure-JVM sentinel median over the pinned idle reference — bench.py r10;
artifacts from before r10 carry no sentinel and default to 1.0, or pass
--old-noise to supply a factor measured another way). Queries whose
NORMALIZED ratio exceeds --bar are listed — that list, not raw deltas,
is what "regressed" means on this ±26%-swing host (BASELINE.md,
sentinel-normalized restatement). Failed queries (t < 0) are skipped.

Exit code 3 when any query exceeds the bar (CI-able); 0 otherwise.
3 is deliberately distinct from the interpreter's crash code (1): the
regen gate treats 3 as "regression", any other nonzero as "the
comparison itself failed" and surfaces the stderr instead of recording
a garbage attribution (ADVICE r11).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _noise(payload: dict, override: float | None) -> float:
    if override:
        return override
    sent = payload.get("sentinel") or {}
    jvm = sent.get("jvm") or {}
    return float(jvm.get("noise_factor") or 1.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--bar", type=float, default=1.2)
    ap.add_argument("--old-noise", type=float, default=None)
    ap.add_argument("--new-noise", type=float, default=None)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument(
        "--floor", type=float, default=0.0,
        help="ignore queries whose raw time is under FLOOR seconds on "
        "BOTH sides: below ~1-2 s the ~0.3 s job-launch floor and "
        "scheduler jitter dominate, and they do not scale with the "
        "sentinel — dividing them by run-level noise factors "
        "manufactures fake regressions (and fake improvements) "
        "symmetrically (BENCH_NOTES_r11). The normalized TOTAL still "
        "includes every query.",
    )
    args = ap.parse_args()

    old = json.loads(Path(args.old).read_text())
    new = json.loads(Path(args.new).read_text())
    nf_old = _noise(old, args.old_noise)
    nf_new = _noise(new, args.new_noise)
    rows = []
    skipped_floor = 0
    for q, t_new in new["queries"].items():
        t_old = old["queries"].get(q)
        if t_old is None or t_old < 0 or t_new < 0:
            continue
        if t_old < args.floor and t_new < args.floor:
            skipped_floor += 1
            continue
        ratio = (t_new / nf_new) / (t_old / nf_old)
        rows.append((ratio, q, t_old, t_new))
    rows.sort(reverse=True)

    tot_old = sum(t for t in old["queries"].values() if t >= 0) / nf_old
    tot_new = sum(t for t in new["queries"].values() if t >= 0) / nf_new
    shared = len(rows)
    print(
        f"noise: old={nf_old} new={nf_new}; normalized totals "
        f"{tot_old:.1f}s -> {tot_new:.1f}s over {shared} shared queries "
        f"({tot_new / tot_old:.3f}x)"
    )
    regressed = [r for r in rows if r[0] > args.bar]
    floor_note = (
        f" ({skipped_floor} sub-{args.floor}s queries excluded from the "
        "per-query bar; still in the totals)" if skipped_floor else ""
    )
    print(
        f"\n{len(regressed)} queries above the {args.bar}x normalized "
        f"bar{floor_note}:"
    )
    for ratio, q, t_old, t_new in regressed[: args.top]:
        print(
            f"  {q}: {t_old:.2f}s -> {t_new:.2f}s raw "
            f"(normalized {ratio:.2f}x)"
        )
    print(f"\nbiggest normalized improvements:")
    for ratio, q, t_old, t_new in rows[-5:][::-1]:
        print(f"  {q}: {t_old:.2f}s -> {t_new:.2f}s ({ratio:.2f}x)")
    return 3 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
