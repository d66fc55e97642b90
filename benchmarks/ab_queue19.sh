#!/bin/bash
# Round-5 queue 19: last two matrix fill-ins —
#   1. the 512^2 batch-4 stacked cell (the one hole left in the hi-res
#      approximate matrix)
#   2. SDXL fold+fast (does the -1.3% exact fold stack on the --fast
#      bundle?)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "QUEUE14 DONE" benchmarks/ab_queue14_r5.log 2>/dev/null; do
  sleep 60
done

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)  [$(date +%H:%M:%S)]"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}

step python bench.py --hypertile 32 --deepcache 3
step python bench.py --family sdxl --steps 20 --conv-backend fold --hypertile 32 --deepcache 3
echo "### QUEUE19 DONE [$(date +%H:%M:%S)]"
