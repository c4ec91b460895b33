#!/bin/bash
# Round-3 sweep 2: tanh GELU + matmul build combinations.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"

echo "=== fwd tanh GELU (KASF_GELU default) ==="
$P fwd
echo "=== fwd tanh GELU + ATTN_BUILD=matmul ==="
KASF_ATTN_BUILD=matmul $P fwd
echo "=== train fused-MLP tails (tanh), remat=attn_core,gcn_agg ==="
KASF_TRAIN_FUSED_MLP=1 KASF_PROBE_REMAT=attn_core,gcn_agg $P train
echo "=== train fused-MLP tails + matmul build ==="
KASF_TRAIN_FUSED_MLP=1 KASF_ATTN_BUILD=matmul KASF_PROBE_REMAT=attn_core,gcn_agg $P train
echo "=== eval protocol (tanh + matmul) ==="
KASF_ATTN_BUILD=matmul python scripts/eval_probe.py
echo "=== kernel probe: bwd matmul build, spatial ==="
KASF_ATTN_BUILD=matmul python scripts/kernel_probe.py bwd
echo "=== kernel probe: temporal shape fwd+bwd, both builds ==="
KASF_KP_SHAPE=temporal python scripts/kernel_probe.py all
echo "=== sweep2 done ==="
