#!/bin/bash
# Round-5 queue 11 (runs after queue 10's marker appears):
#   1. ESRGAN lane-batched tiling (VERDICT r4 next #2)
#   2. GN-affine fold A/B, SDXL + SD-1.5 (VERDICT r4 next #1 half-step)
#   3. hi-res approximate-mode matrix completion (VERDICT r4 next #4):
#      SD-1.5 1024^2 and 2048^2 hypertile/deepcache/stacked, SDXL stacked
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "QUEUE10 DONE\|STOPPED" benchmarks/ab_queue10_r5.log 2>/dev/null; do
  sleep 60
done

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_esrgan_lanes.py
step python bench.py --family sdxl --steps 20 --conv-backend fold
step python bench.py --conv-backend fold
# hi-res matrix: SD-1.5 1024^2 (20-step, batch 1)
step python bench.py --size 1024 --steps 20 --batch 1
step python bench.py --size 1024 --steps 20 --batch 1 --hypertile 32
step python bench.py --size 1024 --steps 20 --batch 1 --deepcache 3
step python bench.py --size 1024 --steps 20 --batch 1 --hypertile 32 --deepcache 3
# SD-1.5 2048^2 (10-step, batch 1)
step python bench.py --size 2048 --steps 10 --batch 1
step python bench.py --size 2048 --steps 10 --batch 1 --hypertile 32
step python bench.py --size 2048 --steps 10 --batch 1 --deepcache 3
step python bench.py --size 2048 --steps 10 --batch 1 --hypertile 32 --deepcache 3
# SDXL stacked (hypertile + deepcache)
step python bench.py --family sdxl --steps 20 --hypertile 32 --deepcache 3
echo "### QUEUE11 DONE [$(date +%H:%M:%S)]"
