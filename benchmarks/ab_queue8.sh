#!/bin/bash
# Round-4 queue 8: AOT serving measurement (VERDICT r3 item 7, second half).
# Each phase runs in its OWN process (nothing warm by accident):
#   export   trace+lower+serialize the whole generation program (no compile)
#   serve    fresh process: deserialize artifact -> first image
#   coldjit  fresh process: live pipeline -> first image
# --no-cache rows are the true-cold comparison; cache-on rows are the
# realistic restart (persistent XLA cache warm from prior benches).
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_aot_serving.py export
step python benchmarks/exp_aot_serving.py serve --no-cache
step python benchmarks/exp_aot_serving.py coldjit --no-cache
step python benchmarks/exp_aot_serving.py serve
step python benchmarks/exp_aot_serving.py coldjit
step python benchmarks/exp_aot_serving.py export --family sdxl
step python benchmarks/exp_aot_serving.py serve --family sdxl
step python benchmarks/exp_aot_serving.py coldjit --family sdxl
echo "### QUEUE8 DONE [$(date +%H:%M:%S)]"
