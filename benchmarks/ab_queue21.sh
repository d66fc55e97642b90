#!/bin/bash
# Round-5 queue 21: 4096^2 native generation probe — 262144-token UNet
# attention (4x the 2048^2 record) + tiled VAE decode (whole-image decode
# exceeds HBM at this size).  Exact first, then the fast preset.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
step() {
  if [ -f /tmp/ab_stop ]; then echo "### STOPPED (stop-file)  [$(date +%H:%M:%S)]"; exit 0; fi
  echo "### $*  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | grep --line-buffered -v "^WARNING"
}
step python bench.py --size 4096 --steps 10 --batch 1 --decode-tile 128
step python bench.py --size 4096 --steps 10 --batch 1 --decode-tile 128 --hypertile 32 --deepcache 3
echo "### QUEUE21 DONE [$(date +%H:%M:%S)]"
