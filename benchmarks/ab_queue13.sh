#!/bin/bash
# Round-5 queue 13 (runs after queue 12): SDXL conv_backend=pallas retry
# after the VMEM-estimator fix (fp32 temps term — queue 10's bh=32 pick
# overflowed Mosaic's 16 MB scoped vmem by 176 KB at the (2,32,32,640->
# 1280) level; the chooser now picks bh=16 there and the 2560-ch decoder
# concat levels fall back to XLA).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "QUEUE12 DONE\|STOPPED" benchmarks/ab_queue12_r5.log 2>/dev/null; do
  sleep 60
done

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python bench.py --family sdxl --steps 20 --conv-backend pallas
echo "### QUEUE13 DONE [$(date +%H:%M:%S)]"
