"""Assemble SCALE_PROBE_CAPSTONES_r{N}.json from the two scale_probe
regime runs plus the near-bar probe (VERDICT r10 task 5).

Usage:
    python tools/merge_capstone_probe.py --round 11 \
        --tagwords /tmp/cap_tagwords.json --suffix /tmp/cap_suffix.json \
        --near-bar /tmp/near_bar.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--tagwords", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--near-bar", required=True)
    args = ap.parse_args()

    tag = json.loads(Path(args.tagwords).read_text())
    suf = json.loads(Path(args.suffix).read_text())
    nb = json.loads(Path(args.near_bar).read_text())
    out = {
        "base_sf_dir": tag.get("base_sf_dir", "/root/testdata/sf0.1"),
        "factors": tag.get("factors"),
        "regimes": {
            "tagwords_proportional": {
                "what": (
                    "proportional growth, zero cross-replica Jaccard — "
                    "the regime a real corpus mostly lives in; both "
                    "routed capstones measure mass under their bars "
                    "here and run the exact tier (oracle-identical "
                    "output, gated at both SFs)"
                ),
                "secs": tag["secs"],
                "scaling_exponent_warm": tag["scaling_exponent_warm"],
            },
            "suffix_duplicate_adversarial": {
                "what": (
                    "every replica is a near-dup of the base — true "
                    "duplicate mass grows quadratically BY CONSTRUCTION "
                    "for the exact pair tier; both routed capstones "
                    "measure mass above their bars from x2 up and take "
                    "the capped tier"
                ),
                "secs": suf["secs"],
                "scaling_exponent_warm": suf["scaling_exponent_warm"],
            },
            "near_bar": {
                "what": nb["what"],
                "bars": nb["bars"],
                "routers": nb["routers"],
            },
        },
    }
    dest = Path(f"SCALE_PROBE_CAPSTONES_r{args.round}.json")
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
