#!/usr/bin/env python
"""Run the north-star scene + all five BASELINE configs on the current
backend and write BENCH_CONFIGS.json (one entry per config).

Each config runs in a SUBPROCESS so a transient tunnel failure or a bad
config cannot poison the others; bench.py itself retries transient errors.

Usage: python -u tools/bench_all.py [--out BENCH_CONFIGS.json]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(arg):
    cmd = [sys.executable, "-u", os.path.join(ROOT, "bench.py")]
    if arg == "5h":  # config-5 feasibility fallback: half-res shadow rays
        cmd += ["--config", "5", "--rt-scale", "2"]
    elif arg:
        cmd += ["--config", str(arg)]
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3000, cwd=ROOT
        )
    except subprocess.TimeoutExpired:
        return {"config": arg or 0, "error": "timeout after 3000s"}
    line = ""
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    if not line:
        return {"config": arg or 0, "error": (p.stderr or p.stdout)[-500:]}
    d = json.loads(line)
    d["config"] = arg or 0
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_CONFIGS.json"))
    ap.add_argument("--configs", default="0,1,2,3,4,5,5h,6,7")
    args = ap.parse_args()

    # merge into an existing capture: a re-run (or a reordered partial
    # run) replaces same-config entries and keeps the rest
    results = []
    try:
        with open(args.out) as f:
            results = [r for r in json.load(f) if "config" in r]
    except Exception:
        pass
    for c in [x if x == "5h" else int(x) for x in args.configs.split(",")]:
        print(f"# running config {c} ...", flush=True)
        r = run_one(c)
        print(json.dumps(r), flush=True)
        results = [x for x in results if x.get("config") != r["config"]] + [r]
        with open(args.out, "w") as f:
            json.dump(sorted(results, key=lambda x: str(x.get("config"))),
                      f, indent=2)
            f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
