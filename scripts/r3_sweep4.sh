#!/bin/bash
# Round-3 sweep 4: train branch ablations + GELU-form isolation.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
P="python scripts/perf_probe.py"

echo "=== fwd matmul build, temporal split (isolate GELU form) ==="
KASF_ATTN_BUILD=matmul KASF_ATTN_VARIANT=split $P fwd
echo "=== train ablate att branch ==="
KASF_ABLATE=att $P train
echo "=== train ablate graph branch ==="
KASF_ABLATE=graph $P train
echo "=== train ablate bone branch ==="
KASF_ABLATE=bone $P train
echo "=== sweep4 done ==="
