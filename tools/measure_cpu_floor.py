#!/usr/bin/env python
"""Measure the CPU reference floor (BASELINE.md step 1) and record it.

Compiles tools/cpu_floor.cpp (the independent re-implementation of the
reference's algorithm — recursive double-precision tracer, BVH,
std::async sample sharding) and times the cover-scene workload on this
machine's CPU.  Writes baseline_measured.json at the repo root, which
bench.py reads to compute vs_baseline.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
SRC = os.path.join(HERE, "cpu_floor.cpp")
BIN = os.path.join(HERE, "cpu_floor")
OUT = os.path.join(ROOT, "baseline_measured.json")


def main() -> int:
    width = int(os.environ.get("FLOOR_WIDTH", "1200"))
    spp = int(os.environ.get("FLOOR_SPP", "4"))
    depth = int(os.environ.get("FLOOR_DEPTH", "50"))

    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", SRC, "-o", BIN],
        check=True,
    )
    res = subprocess.run(
        [BIN, str(width), str(spp), str(depth)],
        capture_output=True, text=True, check=True, timeout=1800,
    )
    print(res.stderr, file=sys.stderr, end="")
    mrays = float(res.stdout.split()[1])
    ncpu = os.cpu_count()
    payload = {
        "cpu_floor_mrays_per_s": mrays,
        "workload": f"cover scene {width}x{int(width/(16/9))} spp={spp} depth={depth}",
        "machine": f"{ncpu}-thread CPU",
        "note": "independent re-implementation of the reference algorithm "
                "(tools/cpu_floor.cpp); reference publishes no numbers and "
                "its conan deps are unavailable (BASELINE.md)",
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
