#!/bin/bash
# Follow-up queue: exact-step baselines for the SDXL A/Bs (queue 1 ran
# SDXL at the 50-step default; the round-3 headline was 20-step).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### bench $*  [$(date +%H:%M:%S)]"
  python bench.py "$@" 2>&1 | grep -v "^WARNING" | tail -3
}

run --family sdxl                        # plain SDXL 1024^2 50-step base
run --family sdxl --steps 20 --deepcache 3   # 20-step deepcache vs 2.46 s
run --family sdxl --steps 20 --hypertile 32  # 20-step hypertile vs 2.46 s
echo "### QUEUE2 DONE [$(date +%H:%M:%S)]"
