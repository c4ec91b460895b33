#!/usr/bin/env bash
# North-star parity gate: evaluate the released reference checkpoint with
# strict matmul precision and assert the MPJPE delta vs the reference is
# <= 0.1 mm (BASELINE.md "Parity targets").
#
# The released checkpoints are NOT mirrored in this environment (the
# reference's checkpoints/ ships empty, see /root/reference/.MISSING_LARGE_BLOBS;
# download links in the reference README checkpoint table). Once
# kasportsformer-sp-gt.pth is available, run:
#
#   scripts/parity_gate.sh /path/to/kasportsformer-sp-gt.pth \
#       [/path/to/sportspose-gt-kasportsformer.yaml] [expected_mpjpe_mm]
#
# The converter reads the reference .pth layout directly (DataParallel
# 'module.' prefixes handled, `train/checkpoint.py`).
set -euo pipefail

CKPT="${1:?usage: parity_gate.sh <kasportsformer-sp-gt.pth> [config.yaml] [expected_mpjpe_mm]}"
CONFIG="${2:-/root/reference/configs/sportspose-gt-kasportsformer.yaml}"
EXPECTED="${3:-}"
cd "$(dirname "$0")/.."

# matmul_precision highest: TPU f32 matmuls default to bf16x3 (~1e-2
# activation deviation); strict parity needs full f32 accumulation.
OUT=$(python -m kasportsformer_tpu evaluate \
    --config-path "$CONFIG" \
    --checkpoint "$CKPT" \
    --matmul-precision highest | tail -n 1)
echo "$OUT"

if [ -n "$EXPECTED" ]; then
python - "$OUT" "$EXPECTED" << 'PY'
import json, sys
result = json.loads(sys.argv[1])
expected = float(sys.argv[2])
delta = abs(result["mpjpe"] - expected)
print(f"MPJPE {result['mpjpe']:.4f} mm vs expected {expected:.4f} mm -> delta {delta:.4f} mm")
assert delta <= 0.1, f"parity gate FAILED: delta {delta:.4f} mm > 0.1 mm"
print("parity gate PASSED (<= 0.1 mm)")
PY
else
  echo "no expected MPJPE given; gate ran eval only (pass expected value as 3rd arg)"
fi
