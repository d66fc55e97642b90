#!/bin/bash
# Round-4 queue 7: IP-Adapter e2e re-measure AFTER the attach-time
# device-placement fix (api._place_host_arrays).  Queue-6 evidence:
# e2e +3.49 s with per-step UNet at only +0.7% — the overhead was the
# per-call host->device re-upload of the numpy adapter tree over the
# relay tunnel.  Expect the delta to collapse to ~vision-tower cost.
# The standalone `vision` part is NOT re-queued: its isolated jit
# compile broke the relay pipe in queue 6 while the same tower inside
# the generate jit compiles fine.
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_ip_insitu.py e2e
echo "### QUEUE7 DONE [$(date +%H:%M:%S)]"
