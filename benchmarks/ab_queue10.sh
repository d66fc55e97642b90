#!/bin/bash
# Round-5 queue 10: SDXL exact-mode frontier (VERDICT r4 next #1).
# The fused GN->SiLU->conv3x3 Pallas kernel was negative at SD-1.5 512^2
# because Mosaic's 128-lane rule excluded the FLOP-dominant 320/960-ch
# levels; SDXL's 640/1280-ch convs at 128^2/64^2 maps are exactly the
# aligned shapes the kernel CAN run.  A/B at the native 1024^2/20-step
# latency config (baseline 2.460 s round-3).
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python bench.py --family sdxl --steps 20
step python bench.py --family sdxl --steps 20 --conv-backend pallas
echo "### QUEUE10 DONE [$(date +%H:%M:%S)]"
