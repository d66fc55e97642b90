#!/bin/bash
# Round-4 queue 9: AnimateDiff frames-mode lane cost — the last
# round-3-late feature without a hardware row (VERDICT r3 item 2).
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_animatediff.py
echo "### QUEUE9 DONE [$(date +%H:%M:%S)]"
