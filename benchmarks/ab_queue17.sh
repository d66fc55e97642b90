#!/bin/bash
# Round-5 queue 17: consolidated resume after the host reset wiped the
# persistent XLA cache (~/.cache/sdt_xla*) and killed queues 11-16
# mid-flight.  Everything below is a COLD compile now; ordered by judge
# value per VERDICT r4 "Next round":
#   0. default headline (also re-primes the driver's bench.py cache)
#   1. SDXL conv_backend=pallas retry + pallas_fold (VERDICT #1)
#   2. hi-res approximate-matrix remainder (VERDICT #4): 1024^2
#      deepcache/stacked, SDXL stacked, 2048^2 all four cells
#   3. one-artifact serving measurement (VERDICT #3), sd15 then sdxl
#   4. ESRGAN compute-vs-fetch split (queue 15's body)
# Serial; graceful stop via `touch /tmp/ab_stop` (checked between steps —
# never kills mid-compile).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)  [$(date +%H:%M:%S)]"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}

step python bench.py
step python bench.py --family sdxl --steps 20 --conv-backend pallas
step python bench.py --family sdxl --steps 20 --conv-backend pallas_fold
step python bench.py --size 1024 --steps 20 --batch 1 --deepcache 3
step python bench.py --size 1024 --steps 20 --batch 1 --hypertile 32 --deepcache 3
step python bench.py --family sdxl --steps 20 --hypertile 32 --deepcache 3
step python bench.py --size 2048 --steps 10 --batch 1
step python bench.py --size 2048 --steps 10 --batch 1 --hypertile 32
step python bench.py --size 2048 --steps 10 --batch 1 --deepcache 3
step python bench.py --size 2048 --steps 10 --batch 1 --hypertile 32 --deepcache 3
for fam in sd15 sdxl; do
  step python benchmarks/exp_aot_serving.py export --family $fam
  step python benchmarks/exp_aot_serving.py prime --family $fam
  step python benchmarks/exp_aot_serving.py serve --family $fam
  step python benchmarks/exp_aot_serving.py coldjit --family $fam
done
step python benchmarks/exp_esrgan_lanes2.py
echo "### QUEUE17 DONE [$(date +%H:%M:%S)]"
