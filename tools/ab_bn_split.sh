#!/bin/bash
# A/B the conv/BN fusion-split barrier and the flat-row anchor gather on
# the flagship bench (one TPU process at a time; run alone).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for cfg in "none" "SIHL_TPU_BN_SPLIT=1" "SIHL_TPU_FLAT_GATHER=1" \
           "SIHL_TPU_BN_SPLIT=1 SIHL_TPU_FLAT_GATHER=1"; do
  echo "=== $cfg"
  if [ "$cfg" = "none" ]; then
    timeout 1200 python bench.py 2>/dev/null || echo "rc=$? (retry once)" && true
  else
    env $cfg timeout 1200 python bench.py 2>/dev/null || echo "rc=$? (retry once)" && true
  fi
done
echo "ab done"
