#!/bin/bash
# Round-4 queue 5: fused-conv kernel A/B (now gated to 128-lane-aligned
# channels) + the IP-Adapter e2e anomaly parts that survived the relay
# restart.  Serial; graceful stop via `touch /tmp/ab_stop` (never kill
# mid-compile — relay-wedge hazard, CLAUDE.md).
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
step python benchmarks/exp_ip_insitu.py vision
step python benchmarks/exp_ip_insitu.py e2e
echo "### QUEUE5 DONE [$(date +%H:%M:%S)]"
