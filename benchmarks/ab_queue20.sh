#!/bin/bash
# Round-5 queue 20: last bonus rows — the latency config (batch 1) with
# the fast preset, and SD-2.1 768^2 stacked.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)  [$(date +%H:%M:%S)]"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}
step python bench.py --batch 1 --hypertile 32 --deepcache 3
step python bench.py --family sd21 --size 768 --steps 20 --batch 1 --hypertile 32 --deepcache 3
echo "### QUEUE20 DONE [$(date +%H:%M:%S)]"
