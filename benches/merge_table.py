"""Merge bench JSON fragments into BENCH_TABLE.json.

Usage: python benches/merge_table.py out.json in1.json in2.json ...
Later files override earlier rows; a `_meta` entry records provenance.
"""

import json
import subprocess
import sys


def main():
    out_path = sys.argv[1]
    merged = {}
    sources = []
    for p in sys.argv[2:]:
        with open(p) as f:
            d = json.load(f)
        for k, v in d.items():
            if not k.startswith("_"):
                merged[k] = v
        sources.append(p)
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    merged["_meta"] = {
        "head": head,
        "sources": sources,
        "harness": "benches/run_benches.py",
        "hardware": "1x TPU v5e via remote tunnel (fenced = includes ~40ms "
        "host<->device round trip; ms_pipelined = device throughput)",
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {out_path} ({len(merged) - 1} rows) at HEAD {head}")


if __name__ == "__main__":
    main()
