#!/bin/bash
# Round-4 queue 8b: second cache-on passes — queue 8's first cache-on
# serve/coldjit COMPILED INTO the persistent cache; these repeats measure
# the realistic warm-cache restart (load -> first image).
# Serial; graceful stop via `touch /tmp/ab_stop`.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep -v "^WARNING"
}

step python benchmarks/exp_aot_serving.py serve
step python benchmarks/exp_aot_serving.py coldjit
step python benchmarks/exp_aot_serving.py serve --family sdxl
step python benchmarks/exp_aot_serving.py coldjit --family sdxl
echo "### QUEUE8B DONE [$(date +%H:%M:%S)]"
