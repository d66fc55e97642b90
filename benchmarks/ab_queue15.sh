#!/bin/bash
# Round-5 queue 15 (runs after queue 14): ESRGAN compute-vs-fetch split +
# uint8-on-device re-measure.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "QUEUE14 DONE\|STOPPED" benchmarks/ab_queue14_r5.log 2>/dev/null; do
  sleep 60
done

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}

step python benchmarks/exp_esrgan_lanes2.py
echo "### QUEUE15 DONE [$(date +%H:%M:%S)]"
