#!/bin/bash
# Watch for the axon TPU tunnel to come back, then capture the round's
# official numbers: bench_all (north star + configs 1-5) and the
# per-stage profile. Run detached:  nohup tools/tpu_watch.sh &
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
echo "$(date +%T) tpu_watch started" >> "$LOG"
while true; do
  if timeout 200 python -c "import bench, sys; sys.exit(0 if bench.probe_is_tpu(150) else 1)" 2>/dev/null; then
    echo "$(date +%T) TPU UP — starting capture" >> "$LOG"
    break
  fi
  echo "$(date +%T) tpu down" >> "$LOG"
  sleep 240
done
# Guard first: compiled-vs-interpret bit-exactness of the Pallas kernel
# on the real hardware (Mosaic has miscompiled patterns before) — numbers
# from a wrong image are worse than no numbers, so a FAILED guard SKIPS
# the captures entirely.
if timeout 1800 python -u tools/check_kernel_hw.py >> "$LOG" 2>&1; then
  echo "$(date +%T) kernel hw check OK" >> "$LOG"
else
  echo "$(date +%T) kernel hw check FAILED — captures SKIPPED (fix the kernel first)" >> "$LOG"
  exit 1
fi
# Sweep first: bench.py reads AB_OPTIONS.json (tuned_options) so the
# north-star capture below — and the driver's own bench.py run at round
# end — use the measured winner.
timeout 7200 python -u tools/ab_options.py >> "$LOG" 2>&1
echo "$(date +%T) ab_options done" >> "$LOG"
python -u tools/bench_all.py --out BENCH_CONFIGS.json >> "$LOG" 2>&1
echo "$(date +%T) bench_all done" >> "$LOG"
timeout 3000 python -u tools/bisect_frame.py --out BENCH_DETAIL.json >> "$LOG" 2>&1
echo "$(date +%T) bisect done — ALL CAPTURES COMPLETE" >> "$LOG"
# Commit the capture artifacts so a round ending mid-session still
# records them (idempotent: nothing staged -> no commit).
git add AB_OPTIONS.json BENCH_CONFIGS.json BENCH_DETAIL.json 2>/dev/null
git commit -q -m "TPU capture artifacts: A/B sweep, configs 0-5, per-stage profile" 2>/dev/null \
  && echo "$(date +%T) artifacts committed" >> "$LOG" \
  || echo "$(date +%T) no artifact changes to commit" >> "$LOG"
