"""Run every queued on-chip A/B in one shot (STATUS.md "Pending on-chip
A/Bs"): spp batching, fill-aware leaf packing, hierarchical env mip
sampler, shadow-ray Russian roulette. Each tool runs in its own
subprocess with a timeout so one hang (e.g. a flaky axon tunnel) cannot
strand the rest; full logs land in /tmp/ab_<name>.log and a short
pass/fail table prints at the end.

Usage: python tools/run_queued_abs.py [--only=name,name] [--timeout=1800]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

TOOLS = [
    ("sppbatch", ["tools/profile_sppbatch.py", "--spp=4"]),
    ("leafpack", ["tools/sweep_leafpack.py", "--spp=3"]),
    ("envsampler", ["tools/profile_envsampler.py", "--spp=3"]),
    ("shadowrr", ["tools/sweep_shadowrr.py", "--spp=3"]),
    ("bench_lanes2", ["bench.py", "--lanes=2"]),
    ("bench_lanes4", ["bench.py", "--lanes=4"]),
    ("bdpt_hd", ["tools/profile_bdpt.py", "--hd"]),
    ("quality_colonnade", [
        "tools/quality_bench.py", "--scene=colonnade", "--size=96",
        "--refspp=256",
    ]),
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = None
    timeout = 1800
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--timeout="):
            timeout = int(a.split("=", 1)[1])
    results = []
    for name, cmd in TOOLS:
        if only and name not in only:
            continue
        log = f"/tmp/ab_{name}.log"
        t0 = time.time()
        try:
            with open(log, "w") as fh:
                rc = subprocess.run(
                    [sys.executable] + cmd, cwd=root, stdout=fh,
                    stderr=subprocess.STDOUT, timeout=timeout,
                ).returncode
            status = "ok" if rc == 0 else f"rc={rc}"
        except subprocess.TimeoutExpired:
            status = "TIMEOUT"
        results.append((name, status, time.time() - t0, log))
        print(f"[{name}] {status} ({time.time() - t0:.0f}s) -> {log}",
              flush=True)
    print("\n=== summary ===")
    for name, status, dt, log in results:
        print(f"{name:12s} {status:8s} {dt:7.0f}s  {log}")


if __name__ == "__main__":
    main()
