#!/bin/bash
# Round-3 sweep 5: Pallas MLP-tail backward in the train step.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"

echo "=== train fused tails + Pallas bwd, remat=attn_core,gcn_agg ==="
KASF_TRAIN_FUSED_MLP=1 KASF_PROBE_REMAT=attn_core,gcn_agg $P train
echo "=== train fused tails + Pallas bwd, remat=attn_core,gcn_agg,mlp_tail ==="
KASF_TRAIN_FUSED_MLP=1 KASF_PROBE_REMAT=attn_core,gcn_agg,mlp_tail $P train
echo "=== train fused tails + Pallas bwd, batch 256, remat=attn_core,gcn_agg,mlp_tail ==="
KASF_TRAIN_FUSED_MLP=1 KASF_PROBE_REMAT=attn_core,gcn_agg,mlp_tail KASF_PROBE_BATCH=256 $P train
echo "=== sweep5 done ==="
