#!/bin/bash
# Round-4 hardware queue: BASELINE config 4 (768^2) with the round-3
# levers applied (VERDICT item 3), plus exact-step SDXL baselines so the
# queue-1 SDXL A/Bs have a denominator (queue 2 never ran).
# Graceful stop: `touch /tmp/ab_stop` — never kill mid-compile.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### bench $*  [$(date +%H:%M:%S)]"
  python bench.py "$@" 2>&1 | grep -v "^WARNING" | tail -3
}

run --size 768 --batch 1                       # config-4 exact baseline, round-4 kernels
run --size 768 --batch 1 --hypertile 32        # hi-res tile-local attention
run --size 768 --batch 1 --deepcache 3         # approximate mode
run --size 768 --batch 1 --deepcache 3 --hypertile 32  # stacked levers
run --family sdxl                              # SDXL 1024^2 50-step exact base
run --family sdxl --steps 20 --deepcache 3     # vs 2.46 s 20-step headline
run --family sdxl --steps 20 --hypertile 32    # vs 2.46 s 20-step headline
echo "### QUEUE3 DONE [$(date +%H:%M:%S)]"
