#!/bin/bash
# Round-3 sweep 3: train-step attribution + logistic GELU.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"

echo "=== fwd logistic GELU + matmul build ==="
KASF_ATTN_BUILD=matmul $P fwd
echo "=== train ablate mlp (tails dropped) ==="
KASF_ABLATE=mlp $P train
echo "=== train ablate attncore (sdpa kernels dropped) ==="
KASF_ABLATE=attncore $P train
echo "=== train ablate gcnt ==="
KASF_ABLATE=gcnt $P train
echo "=== sweep3 done ==="
