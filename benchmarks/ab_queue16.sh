#!/bin/bash
# Round-5 queue 16 (after queue 15): combined conv tier on SDXL exact
# mode — pallas res-block kernel where eligible + folded norms elsewhere.
# Stacks the queue-11 fold win (-1.3%) with whatever queue 13's pallas
# retry shows.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "QUEUE15 DONE\|STOPPED" benchmarks/ab_queue15_r5.log 2>/dev/null; do
  sleep 60
done

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}

step python bench.py --family sdxl --steps 20 --conv-backend pallas_fold
echo "### QUEUE16 DONE [$(date +%H:%M:%S)]"
