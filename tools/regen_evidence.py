"""Regenerate the full evidence chain in one command (VERDICT r6
task 7): every artifact family the round's claims rest on, produced
from the CURRENT code so nothing can go stale between rounds.

Usage:
    python tools/regen_evidence.py --round 7 [--skip bench,sweeps,...]
                                   [--with-scale-probe]

Artifact families (in run order — each step is a separate process so
one Spark session's caches/JIT never bleed into another's timings):

1. sweeps   CORRECTNESS_LOCAL_r{N}.json (sf0.01) and
            CORRECTNESS_SF01_r{N}.json (sf0.1) — full-registry DuckDB
            oracle sweeps with per-query canonical value hashes.
2. bench    BENCH_LOCAL_r{N}.json — idle 2-pass (min) per-query bench
            with stage metrics, split into BENCH_METRICS_r{N}.json.
3. shuffle  SHUFFLE.md — measured per-query shuffle/input/spill bytes
            rendered from the metrics artifact.
4. plans    PLANSTATS.md + PLANS.md — compile-time plan audit tables;
            also asserts `tools/audit_plans.py` reports 0 violations.
5. recall   RECALL_r{N}.json — dedup/ANN recall vs the exact tiers.
6. scale    (--with-scale-probe only; ~30+ min) SCALE_PROBE.json via
            the default probe set at x1..x8.

Timing discipline: steps run strictly SEQUENTIALLY — concurrent Spark
work inflates Python-worker queries 2-3x (BASELINE.md) and would turn
the bench artifact into noise. Do not run this with other Spark jobs
alive on the machine.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(cmd: list[str], env: dict[str, str] | None = None, out: Path | None = None) -> None:
    t0 = time.time()
    print(f"--> {' '.join(cmd)}" + (f" > {out.name}" if out else ""), flush=True)
    full_env = {**os.environ, **(env or {})}
    if out:
        with out.open("w") as fh:
            subprocess.run(
                cmd, cwd=REPO, env=full_env, stdout=fh,
                stderr=subprocess.DEVNULL, check=True,
            )
    else:
        subprocess.run(
            cmd, cwd=REPO, env=full_env,
            stderr=subprocess.DEVNULL, check=True,
        )
    print(f"    done in {time.time() - t0:.0f}s", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, help="round number N for _r{N} suffixes")
    ap.add_argument(
        "--skip", default="",
        help="comma-separated families to skip: sweeps,bench,shuffle,plans,recall",
    )
    ap.add_argument(
        "--with-scale-probe", action="store_true",
        help="also run the (slow) default scale probe at x1..x8",
    )
    ap.add_argument(
        "--allow-regression", default=None, metavar="NOTE",
        help="accept a >1.2x-normalized per-query bench regression vs "
        "the previous round's committed artifact, recording NOTE (the "
        "attribution) into BENCH_NOTES_r{N}.md. Without this, a "
        "regressing bench artifact aborts the regen (VERDICT r10 "
        "task 6).",
    )
    args = ap.parse_args()
    n = args.round
    skip = set(filter(None, args.skip.split(",")))
    py = sys.executable

    if "sweeps" not in skip:
        _run([py, "tools/check_correctness.py", "/root/testdata/sf0.01",
              "--out", f"CORRECTNESS_LOCAL_r{n}.json"])
        _run([py, "tools/check_correctness.py", "/root/testdata/sf0.1",
              "--out", f"CORRECTNESS_SF01_r{n}.json"])
        for name in (f"CORRECTNESS_LOCAL_r{n}.json", f"CORRECTNESS_SF01_r{n}.json"):
            summary = json.loads((REPO / name).read_text())["summary"]
            print(f"    {name}: {summary}", flush=True)
            assert summary["fail"] == 0, f"{name} records failures — fix before shipping"

    if "bench" not in skip:
        _run([py, "bench.py"], env={
            "SPARK_GRAFT_BENCH_PASSES": "2",
            "SPARK_GRAFT_BENCH_METRICS": "1",
            "SPARK_GRAFT_BENCH_OUT": f"BENCH_LOCAL_r{n}.json",
        }, out=REPO / f"_bench_stdout_r{n}.log")
        (REPO / f"_bench_stdout_r{n}.log").unlink()
        local = json.loads((REPO / f"BENCH_LOCAL_r{n}.json").read_text())
        # split the metrics into their own artifact (bench_report input)
        metrics = {k: local[k] for k in ("queries", "stage_metrics", "sf", "passes") if k in local}
        (REPO / f"BENCH_METRICS_r{n}.json").write_text(json.dumps(metrics, indent=1) + "\n")
        total = local.get("value")
        nq = sum(1 for t in local["queries"].values() if t >= 0)
        # r10: report the sentinel-normalized total alongside the raw
        # one — round-over-round comparisons use the normalized number
        # (BASELINE.md's restated band: normalized 0.8-1.1 s/q)
        sent = local.get("sentinel", {})
        nf = sent.get("jvm", {}).get("noise_factor")
        pynf = sent.get("python_worker", {}).get("noise_factor")
        norm = local.get("normalized_value") or total
        print(
            f"    BENCH_LOCAL_r{n}: {total}s raw / {nq} queries; "
            f"noise_factor={nf} py={pynf}; normalized {norm}s "
            f"= {norm/nq:.2f} s/q",
            flush=True,
        )
        # Regression gate (VERDICT r10 task 6): a regen must not ship a
        # bench artifact where any query regressed >1.2x NORMALIZED vs
        # the previous round's committed artifact without an explicit,
        # recorded attribution — silent regressions read as code when
        # they are usually environment, and vice versa.
        prev = REPO / f"BENCH_LOCAL_r{n - 1}.json"
        if prev.exists():
            cmp_ = subprocess.run(
                [py, "tools/bench_compare.py", str(prev),
                 f"BENCH_LOCAL_r{n}.json", "--floor", "2.0"],
                cwd=REPO, capture_output=True, text=True,
            )
            print("    bench_compare vs r{}:".format(n - 1), flush=True)
            for line in cmp_.stdout.strip().splitlines():
                print(f"      {line}", flush=True)
            if cmp_.returncode not in (0, 3):
                # the comparison itself crashed (malformed artifact,
                # missing key): surface the real error instead of
                # recording a garbage "regression" (ADVICE r11;
                # bench_compare exits 3 for a genuine regression)
                sys.stderr.write(cmp_.stderr)
                raise SystemExit(
                    f"bench_compare crashed (rc={cmp_.returncode}) — "
                    "fix the comparison inputs; this is NOT a bench "
                    "regression"
                )
            if cmp_.returncode == 3:
                if args.allow_regression:
                    notes = REPO / f"BENCH_NOTES_r{n}.md"
                    with notes.open("a") as fh:
                        fh.write(
                            f"\n## Accepted bench regression vs r{n - 1}"
                            f" (regen gate)\n\n{args.allow_regression}\n\n"
                            "```\n" + cmp_.stdout + "```\n"
                        )
                    print(
                        f"    regression ACCEPTED; attribution recorded "
                        f"in {notes.name}", flush=True,
                    )
                else:
                    raise SystemExit(
                        f"bench regression: queries above the 1.2x "
                        f"normalized bar vs BENCH_LOCAL_r{n - 1}.json — "
                        "re-run on a quiet host, fix the regression, or "
                        "re-invoke with --allow-regression "
                        "'<attribution note>'"
                    )

    if "shuffle" not in skip:
        _run([py, "tools/bench_report.py", f"BENCH_METRICS_r{n}.json"],
             out=REPO / "SHUFFLE.md")

    if "plans" not in skip:
        audit = subprocess.run(
            [py, "tools/audit_plans.py"], cwd=REPO, capture_output=True, text=True
        )
        last = audit.stdout.strip().splitlines()[-1] if audit.stdout.strip() else ""
        print(f"    audit_plans: {last}", flush=True)
        assert "0 plan violations" in last, last
        _run([py, "tools/plan_stats.py"], out=REPO / "PLANSTATS.md")
        _run([py, "tools/dump_plans.py"], out=REPO / "PLANS.md")

    if "recall" not in skip:
        _run([py, "tools/recall_probe.py", "/root/testdata/sf0.1",
              "--out", f"RECALL_r{n}.json"])
        print(f"    RECALL_r{n}: " + (REPO / f"RECALL_r{n}.json").read_text()[:400].replace("\n", " "), flush=True)

    if args.with_scale_probe:
        _run([py, "tools/scale_probe.py", "--out", "SCALE_PROBE.json"])

    print("evidence regeneration complete", flush=True)


if __name__ == "__main__":
    main()
