#!/bin/bash
# Round-5 queue 22: 4096^2 hypertile-only (isolates the exact-mode crash
# to the global 262144-token attention; deepcache off), then a final
# plain-headline re-confirmation after tonight's worker crash.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)  [$(date +%H:%M:%S)]"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}
step python bench.py --size 4096 --steps 10 --batch 1 --decode-tile 128 --hypertile 32
step python bench.py
echo "### QUEUE22 DONE [$(date +%H:%M:%S)]"
