#!/bin/bash
# Round-5 capture chain, take 2: config 0 is already captured (94.77 ms,
# slim_p); run the remaining configs PRIORITY-FIRST so a session cutoff
# keeps the captures that matter most — 5 (threaded traversal showcase),
# 3 (the r4 weak item), 7 (new geometry stress) — then the animated run
# and the per-stage profiles. bench_all merges into BENCH_CONFIGS.json.
# Run detached: nohup tools/r5_watch2.sh > /tmp/r5_watch2.log 2>&1 &
cd "$(dirname "$0")/.."
set -x
timeout 6600 python -u tools/bench_all.py --configs 5,3,7 --out BENCH_CONFIGS.json
git add BENCH_CONFIGS.json && git commit -q -m "TPU capture: configs 5/3/7 refresh" || true
timeout 2400 python -u bench.py --anim 60 --config 4 | tail -1 > BENCH_ANIM.json
git add BENCH_ANIM.json && git commit -q -m "TPU capture: 60-frame animated run (config 4)" || true
timeout 4800 python -u tools/bench_all.py --configs 6,5h,1,2,4 --out BENCH_CONFIGS.json
git add BENCH_CONFIGS.json && git commit -q -m "TPU capture: remaining configs refresh" || true
timeout 2400 python -u tools/bisect_frame.py --config 3 --out BENCH_DETAIL_C3.json
timeout 2400 python -u tools/bisect_frame.py --out BENCH_DETAIL.json
git add BENCH_DETAIL_C3.json BENCH_DETAIL.json && git commit -q -m "TPU capture: per-stage profiles refresh" || true
echo "r5_watch2 DONE"
