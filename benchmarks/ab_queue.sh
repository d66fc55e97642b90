#!/bin/bash
# Prioritized serial hardware A/B queue (relay recovered 2026-08-19).
# Graceful stop: `touch /tmp/ab_stop` — finishes the current run, then
# exits WITHOUT killing anything mid-compile (relay-wedge hazard,
# CLAUDE.md).  Results tee'd by the caller.
#
# Recorded already (see benchmarks/RESULTS.md "Round-3-late hardware"):
#   baseline 1.2708 (dup under contention: 1.2696) | deepcache 3: 1.7241
#   tome 0.5: 1.3594 | batch1 w8 | batch1 deepcache (instances 1+2)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### bench $*  [$(date +%H:%M:%S)]"
  python bench.py "$@" 2>&1 | grep -v "^WARNING" | tail -3
}

run --sampler lcm --steps 4 --no-cfg --batch 1   # few-step distilled
run --family sdxl --deepcache 3          # SDXL DeepCache
run --family sdxl --tome 0.5             # SDXL ToMe (deep attn stacks)
run --hypertile 32                       # Hypertile 512^2 batch 4
run --family sdxl --hypertile 32         # Hypertile SDXL 1024^2
run --batch 1 --pag-scale 3.0            # PAG lane cost
run --batch 1 --sag-scale 0.75           # SAG capture+degraded cost
run --sampler dpm++_sde                  # SDE sampler cost
run --batch 1 --deepcache 3              # DeepCache latency
run --batch 1 --tome 0.5                 # ToMe latency
run --sampler lms                        # LMS cost
run --sampler dpm2                       # DPM2 cost
echo "### features (exp_round3_features.py)  [$(date +%H:%M:%S)]"
if [ ! -f /tmp/ab_stop ]; then
  python benchmarks/exp_round3_features.py 2>&1 | grep -v "^WARNING" | tail -25
fi
echo "### QUEUE DONE [$(date +%H:%M:%S)]"
