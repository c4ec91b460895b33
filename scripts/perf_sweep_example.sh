#!/bin/bash
# Example attribution/A-B sweep over perf_probe env toggles (sequential —
# one TPU). Copy and edit per campaign; past sweeps live in git history and
# their numbers in docs/ROUND_NOTES.md.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"

echo "=== fwd baseline (split/concat) ==="
$P fwd
echo "=== fwd ATTN_BUILD=matmul ==="
KASF_ATTN_BUILD=matmul $P fwd
echo "=== fwd ablate attncore (kernels -> identity) ==="
KASF_ABLATE=attncore $P fwd
echo "=== fwd ablate mlp (all MLP tails dropped) ==="
KASF_ABLATE=mlp $P fwd
echo "=== fwd ablate gcnt (temporal-GCN adjacency build dropped) ==="
KASF_ABLATE=gcnt $P fwd
echo "=== train baseline remat=attn_core,gcn_agg,mlp_hidden ==="
$P train
echo "=== train ATTN_BUILD=matmul ==="
KASF_ATTN_BUILD=matmul $P train
echo "=== train fused-MLP tails, remat=attn_core,gcn_agg ==="
KASF_TRAIN_FUSED_MLP=1 KASF_PROBE_REMAT=attn_core,gcn_agg $P train
echo "=== train remat=none (save-all) ==="
KASF_PROBE_REMAT=none $P train
echo "=== train remat=none batch 64 ==="
KASF_PROBE_REMAT=none KASF_PROBE_BATCH=64 $P train
echo "=== sweep done ==="
