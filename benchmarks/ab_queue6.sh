#!/bin/bash
# Round-4 queue 6: IP-Adapter vision/e2e with the space-to-depth patch
# embedding (the strided-conv tower compile killed the relay twice), plus
# the R=200 fetch-subtracted isolated conv re-measurement for the record.
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_ip_insitu.py vision
step python benchmarks/exp_ip_insitu.py e2e
step python benchmarks/exp_conv_kernel.py isolated
echo "### QUEUE6 DONE [$(date +%H:%M:%S)]"
