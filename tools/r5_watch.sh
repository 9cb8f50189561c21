#!/bin/bash
# Round-5 recovery chain: wait for a HEALTHY axon tunnel (probe answers
# "tpu" AND a small round-trip is fast — on 2026-08-20 the tunnel spent a
# stretch answering probes while a 1k matmul host-read took 165 s), then
# run the round's pending captures in order. Run detached:
#   nohup tools/r5_watch.sh > /tmp/r5_watch.log 2>&1 &
cd "$(dirname "$0")/.."
LOG=/tmp/r5_watch.log
echo "$(date +%T) r5_watch started"
while true; do
  if timeout 200 python -c "import bench, sys; sys.exit(0 if bench.probe_is_tpu(150) else 1)" 2>/dev/null; then
    # latency sanity: tiny matmul round-trip must finish fast
    if timeout 60 python -c "
import jax, numpy as np
x = jax.device_put(np.ones((1000, 1000), np.float32))
print(float(jax.jit(lambda a: (a @ a).sum())(x)))
" >/dev/null 2>&1; then
      echo "$(date +%T) tunnel HEALTHY - starting captures"
      break
    fi
    echo "$(date +%T) tunnel answers but is SLOW"
  else
    echo "$(date +%T) tunnel down"
  fi
  sleep 240
done
set -x
# 1. hardware kernel guard before any capture
timeout 1800 python -u tools/check_kernel_hw.py || exit 1
# 2. all configs (threaded config 5, fixed config 3) — the headline refresh
timeout 7200 python -u tools/bench_all.py --out BENCH_CONFIGS.json
# 3. animated capture (VERDICT r4 next #9)
timeout 3000 python -u bench.py --anim 60 --config 4 | tail -1 > BENCH_ANIM.json
# 4. config-3 honest profile with split twins + wh-chains in place
timeout 3000 python -u tools/bisect_frame.py --config 3 --out BENCH_DETAIL_C3.json
# 5. north-star per-stage refresh
timeout 3000 python -u tools/bisect_frame.py --out BENCH_DETAIL.json
git add BENCH_DETAIL_C3.json BENCH_CONFIGS.json BENCH_ANIM.json BENCH_DETAIL.json 2>/dev/null
git commit -q -m "TPU capture artifacts: config profiles, all configs, animated run" \
  && echo "$(date +%T) artifacts committed" || echo "$(date +%T) nothing to commit"
echo "$(date +%T) r5_watch DONE"
