#!/bin/bash
# Round-3 sweep 6: headline bench at new defaults + post-change train attribution.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"

echo "=== full bench (new defaults) ==="
python bench.py
echo "=== train ablate mlp (post-kernel residual) ==="
KASF_ABLATE=mlp $P train
echo "=== train ablate attncore (post-change) ==="
KASF_ABLATE=attncore $P train
echo "=== eval probe (new defaults) ==="
python scripts/eval_probe.py
echo "=== sweep6 done ==="
