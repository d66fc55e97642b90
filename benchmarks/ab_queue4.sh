#!/bin/bash
# Round-4 hardware queue #2: the fused-conv frontier (VERDICT item 4) and
# the IP-Adapter lane-cost localization (flagged +275.6% anomaly).
# Strictly serial; graceful stop: `touch /tmp/ab_stop` — never kill
# mid-compile.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_conv_kernel.py isolated
step python benchmarks/exp_conv_kernel.py insitu
step python benchmarks/exp_ip_insitu.py
echo "### QUEUE4 DONE [$(date +%H:%M:%S)]"
