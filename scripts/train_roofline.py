"""Train-step roofline: per-term MXU/VPU/HBM arithmetic for the flagship's
fused train step (batch 128, 32-clip gradient microbatches, bf16,
remat = attn_core + gcn_agg + mlp_tail).

VERDICT round-3 task 2 asked for "per-term bytes and MXU tile-ops for
projection grads, fused-stage-1 backward, and the microbatch scan's
residual traffic — or the arithmetic that proves ~3.6x fwd:train is the
floor". This script IS that arithmetic: every matmul in one microbatch's
forward, replay and backward is enumerated from shapes, costed against the
MEASURED machine rates (ROUND_NOTES round-2 "hardware reality": thin-K
(K=128) matmuls ~29 TF/s bf16, fat-K ~170 TF/s, HBM ~700 GB/s effective),
and the kernel terms use their MEASURED per-call costs (in-model
ablations). Output: a table of step-time contributions vs the measured
step, and the implied floor.

Run anywhere (pure arithmetic, no device): python scripts/train_roofline.py
"""

import sys

# ------------------------------------------------ machine rates (measured)
THIN_K_TFS = 29e12    # K=128 matmul, bf16 (ROUND_NOTES round-2)
FAT_K_TFS = 150e12    # K in the thousands (dW grads) — derated from 176 peak
HBM_GBS = 700e9       # effective

# ------------------------------------------------ step shapes
B = 32                # microbatch clips
MICRO = 4             # microbatches per optimizer step (batch 128)
T, J, C = 27, 17, 128
H = 8
LAYERS = 26
HID = 4 * C           # MLP hidden 512
TOK = B * T * J       # tokens per microbatch = 14,688
PARAMS = 29_365_668

# measured per-128-clip-batch kernel costs (ms), v5e, in-model ablations
# (docs/ROUND_NOTES.md round-3/4 sessions) — scaled to one microbatch (/4)
SDPA_FWD_MS_BATCH128 = 60.0     # all 104 fwd sdpa calls (ablate attncore)
MLP_FWD_MS_BATCH128 = 51.0      # all 156 fused LN-MLP tails forward
MLP_BWD_MS_BATCH128 = 92.0      # fused LN-MLP backward kernel
SDPA_BWD_PER_FWD = 2.5          # bwd kernel / fwd kernel (round-2 measure)


def matmul_ms(m: int, k: int, n: int, rate: float, count: int = 1) -> float:
    return 2.0 * m * k * n * count / rate * 1e3


def main() -> int:
    rows = []

    def add(name, ms, note="", counted=True):
        rows.append((name, ms, note, counted))

    # ---------------- projections (thin-K, K=C or K=HID) ----------------
    # Per layer, out-columns projected from the C-wide stream:
    #   att: qkv 3C + proj C (spatial) + qkv 3C + proj C (temporal)
    #   bone: q C + kv 2C (spatial) + q C + kv 2C (temporal) + proj 2C
    #   graph: V C + U C (spatial GCN; temporal GCN V/U inside module 2C)
    #   fusion gate: 3x(C->3) ~ negligible
    out_cols = (3 * C + C + 3 * C + C) + (C + 2 * C + C + 2 * C + 2 * C) \
        + (C + C + 2 * C)
    fwd_proj = matmul_ms(TOK, C, out_cols, THIN_K_TFS, LAYERS)
    add("projections fwd", fwd_proj, f"{out_cols} cols/layer, K=128 @29TF/s")
    # replay: remat policy saves attn_core/gcn_agg/mlp_tail -> every
    # projection re-runs in the backward
    add("projections replay", fwd_proj, "full re-run under remat")
    # dx: dY @ W^T — same FLOPs, K = out_cols slices (still lane-thin
    # per-projection: K<=512) -> thin-K rate
    add("projections dx", fwd_proj, "dY @ W^T, thin-K")
    # dW: X^T dY — K = TOK (fat) -> fast
    dw_proj = matmul_ms(C, TOK, out_cols, FAT_K_TFS, LAYERS)
    add("projections dW", dw_proj, "X^T dY, K=14.7K @150TF/s")

    # ---------------- MLP tails (measured kernels) ----------------
    add("MLP tails fwd (kernel)", MLP_FWD_MS_BATCH128 / 4,
        "measured, 156 fused LN-MLP tails")
    add("MLP tails bwd (kernel)", MLP_BWD_MS_BATCH128 / 4,
        "measured, flash-style recompute")
    # MLP FLOP sanity: fwd ideal = 2 matmuls (C->4C->C) over 6 tails/layer
    mlp_ideal = matmul_ms(TOK, C, HID, THIN_K_TFS, 6 * LAYERS) * 2
    add("  (MLP fwd matmul-only ideal)", mlp_ideal,
        "what the dots alone would cost — kernel is VPU(GELU)-bound",
        counted=False)

    # ---------------- sdpa cores (measured kernels) ----------------
    add("sdpa fwd (kernel, in-step)", SDPA_FWD_MS_BATCH128 / 4,
        "measured (104 calls)")
    add("sdpa bwd (kernel)", SDPA_FWD_MS_BATCH128 / 4 * SDPA_BWD_PER_FWD,
        f"{SDPA_BWD_PER_FWD}x fwd (measured round-2)")
    # forward sdpa cores are SAVED (attn_core) -> not replayed

    # ---------------- graph branch (GCN/BN) ----------------
    # spatial: adjacency (17x17) einsum over tokens; temporal: dynamic
    # top-k sim (27x27 per B*J) + agg; BN. Whole-branch ablation measured
    # ~67 ms/step at micro=32 minus its tails/projections -> ~30 ms resid
    add("GCN aggregate/BN fwd+bwd", 30.0 / 4, "from branch ablation resid")

    # ---------------- embeds / head / refusion / loss ----------------
    head_ms = (matmul_ms(TOK, C, 512, THIN_K_TFS)          # rep_logit
               + matmul_ms(TOK, 512, 3, THIN_K_TFS)) * 3   # fwd+dx+dW-ish
    add("embeds/rep/head/refusion/loss", head_ms + 2.0, "small")

    # ---------------- memory terms ----------------
    # saved residuals per microbatch: attn cores 4/layer + gcn_agg 2/layer
    # + mlp_tail 6/layer, each (B,T,J,C) bf16
    resid_bytes = (4 + 2 + 6) * LAYERS * B * T * J * C * 2
    add("saved-residual HBM (write+read)",
        2 * resid_bytes / HBM_GBS * 1e3, f"{resid_bytes/1e6:.0f} MB")
    # microbatch grad accumulation: f32 grads read+write per microbatch
    acc_bytes = 2 * PARAMS * 4
    add("grad-accum HBM", acc_bytes / HBM_GBS * 1e3, "f32 r+w / microbatch")

    micro_ms = sum(ms for _, ms, _, counted in rows if counted)
    # optimizer: AdamW over params+m+v, once per optimizer STEP (not per
    # microbatch): ~5 f32 arrays r/w
    opt_ms = 10 * PARAMS * 4 / HBM_GBS * 1e3

    print("per-microbatch (32 clips) terms:")
    for name, ms, note, _counted in rows:
        print(f"  {name:38s} {ms:7.2f} ms   {note}")
    step_ms = micro_ms * MICRO + opt_ms
    print(f"\noptimizer update (per step): {opt_ms:.2f} ms")
    print(f"roofline step (4 microbatches + opt): {step_ms:.1f} ms "
          f"-> {128 / step_ms * 1e3:,.0f} clips/s")
    print("measured step (ROUND_NOTES round-4): 456 ms -> 281 clips/s; "
          "fwd 129 ms -> 992 clips/s")
    print(f"roofline fwd:train ratio at fwd=129ms: {step_ms/129:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
