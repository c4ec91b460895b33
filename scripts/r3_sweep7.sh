#!/bin/bash
# Round-3 sweep 7: chunk-size sweep at batch 1024.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"
for CH in 256 512 1024; do
  echo "=== fwd batch 1024 chunk $CH ==="
  KASF_PROBE_BATCH=1024 KASF_PROBE_CHUNK=$CH $P fwd
done
echo "=== fwd batch 512 chunk 256 ==="
KASF_PROBE_BATCH=512 KASF_PROBE_CHUNK=256 $P fwd
echo "=== sweep7 done ==="
