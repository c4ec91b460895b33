"""KASportsFormer — the flagship 2D→3D pose lifter, TPU-native.

Re-designed from the reference `model/KASportsFormer.py` (+ its modules) as a
pure-functional JAX model:

* the kinematic bone decomposition is a fused gather/normalize
  (≙ free function `bone_decomposer`, `model/KASportsFormer.py:42-62`);
* BoneRefusion's 17 ragged per-limb MLPs run as ONE padded/masked batched
  einsum over a (17, 4)-dense limb-combination table instead of a Python loop
  of 17 tiny modules (≙ `model/modules/bone_refusion.py:61-70` +
  `model/modules/bone_MLP.py`);
* the 26-layer trunk executes as `jax.lax.scan` over stacked layer params —
  one compiled layer body, 26x smaller HLO — with the reference's
  layer-0-only bone routing (`model/KASportsFormer.py:332-336`) expressed as
  a per-step `where` select inside the scan;
* GCN batch-norm running statistics are threaded as explicit scan state.

Forward contract: (B, T=27, J=17, C=3) -> (B, 27, 17, 3).
Parameter count with the public config equals the reference's 29,365,668.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.models import layers as L
from kasportsformer_tpu.skeleton import (
    BONE_CHILD,
    BONE_PARENT,
    LIMB_COMBINATIONS,
    MAX_LIMB_COMBINATION,
    limb_combination_matrix,
    spatial_adjacency,
)

Params = dict[str, Any]

# A/B knobs for the fused trunk body, read at TRACE time inside
# `fused_trunk_layer_apply` (call-time, not import-time — see docs/KNOBS.md
# for the contract):
#   KASF_GATE_SPLIT — fusion-gate formulation: split per-branch gate matmuls
#     (default "1") vs the reference's concat form.
#   KASF_STAGE1 — "sep" (default) per-branch LN + projections; "wide" one
#     (C,6C) LN-folded matmul. Measured on v5e (round 3): wide is ~14%
#     SLOWER in-model (552 vs 644 clips/s at batch 128) — the single wide
#     matmul + output slices defeat XLA's LN->matmul->consumer fusions.
#   KASF_HG_BF16 — graph LN-stream source: bf16 xh (default; frees the f32
#     norm core early) vs f32 xh.
#   KASF_ABLATE — profiling-only branch ablation: "att" | "graph" | "bone"
#     replaces that branch's output with the input stream, so XLA
#     dead-code-eliminates the branch's entire compute — the only
#     trustworthy in-model attribution method on this hardware
#     (docs/ROUND_NOTES.md). NEVER set in production.
def _trunk_knobs() -> tuple[bool, str, bool, str]:
    return (os.environ.get("KASF_GATE_SPLIT", "1") != "0",
            os.environ.get("KASF_STAGE1", "sep"),
            os.environ.get("KASF_HG_BF16", "1") != "0",
            os.environ.get("KASF_ABLATE", ""))


def _stream_transpose(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, J, C) <-> (B, J, T, C) stream transpose for the tokens-major
    temporal modules, with the physical relayout PINNED at the 128-channel
    stream via an optimization_barrier (default on; KASF_TBAR=0 for A/B) —
    without it XLA sinks the transpose past the 3x-wider qkv projection and
    materializes the layout copy on (…, 384) operands at the Pallas-call
    boundary. trace_probe found ~23 ms/step of relayout copies in the bf16
    forward; the barrier recovers 983 -> 1,006 clips/s @128 (+2.3%) and is
    neutral in the train step (274 vs 275 — measured round 5, v5e)."""
    xt = x.transpose(0, 2, 1, 3)
    if os.environ.get("KASF_TBAR", "1") != "0":
        xt = jax.lax.optimization_barrier(xt)
    return xt

# (16, 17) selection matrix: row b = e[child_b] - e[parent_b], so
# M @ joints_xy yields all bone vectors in one matmul. Kept as numpy — it
# becomes a folded constant under jit; no device array at import time.
_BONE_MATRIX = np.zeros((16, 17), np.float32)
for _b, (_c, _p) in enumerate(zip(BONE_CHILD, BONE_PARENT)):
    _BONE_MATRIX[_b, _c] = 1.0
    _BONE_MATRIX[_b, _p] = -1.0


# ------------------------------------------------------------ kinematic ops


def bone_decomposer(x: jnp.ndarray) -> jnp.ndarray:
    """[B,T,17,>=2] joints -> [B,T,17,3] bone tokens (dir_x, dir_y, length).

    16 parent-child bone vectors from the 2D joint coordinates, normalized to
    unit length (zero-length guard: length treated as 1), plus the per-frame
    mean bone as a 17th token (≙ `model/KASportsFormer.py:42-62`).
    """
    xy = x[..., :2]
    # bone extraction as one (16,17) matmul instead of two joint gathers
    # (gathers cost ~15x more than the matmul on TPU for these shapes)
    directions = jnp.matmul(jnp.asarray(_BONE_MATRIX, xy.dtype), xy)  # (B,T,16,2)
    lengths = jnp.linalg.norm(directions, axis=-1, keepdims=True)  # (B,T,16,1)
    lengths = jnp.where(lengths == 0, jnp.ones_like(lengths), lengths)
    directions = directions / lengths

    dir_mean = jnp.mean(directions, axis=-2, keepdims=True)
    len_mean = jnp.mean(lengths, axis=-2, keepdims=True)
    directions = jnp.concatenate([directions, dir_mean], axis=-2)  # (B,T,17,2)
    lengths = jnp.concatenate([lengths, len_mean], axis=-2)  # (B,T,17,1)
    return jnp.concatenate([directions, lengths], axis=-1)  # (B,T,17,3)


def bone_refusion_init(key: jax.Array, hidden: int = 16) -> Params:
    """Params for the batched limb re-fusion: for each of 17 limb combinations
    and each of 3 channels, an MLP (k -> hidden -> 1) over the composed-bone
    axis. Weights are initialized per real combination width k (torch Linear
    default on the unpadded fan-in) and zero-padded to MAX_LIMB_COMBINATION.
    """
    n_groups = len(LIMB_COMBINATIONS)
    kmax = MAX_LIMB_COMBINATION
    w1 = np.zeros((n_groups, 3, kmax, hidden), np.float32)
    b1 = np.zeros((n_groups, 3, hidden), np.float32)
    w2 = np.zeros((n_groups, 3, hidden), np.float32)
    b2 = np.zeros((n_groups, 3), np.float32)
    keys = jax.random.split(key, n_groups * 3)
    for g, combo in enumerate(LIMB_COMBINATIONS):
        k = len(combo)
        for c in range(3):
            k1, k2, k3, k4 = jax.random.split(keys[g * 3 + c], 4)
            bound1 = 1.0 / math.sqrt(k)
            bound2 = 1.0 / math.sqrt(hidden)
            w1[g, c, :k] = np.asarray(
                jax.random.uniform(k1, (k, hidden), jnp.float32, -bound1, bound1))
            b1[g, c] = np.asarray(
                jax.random.uniform(k2, (hidden,), jnp.float32, -bound1, bound1))
            w2[g, c] = np.asarray(
                jax.random.uniform(k3, (hidden,), jnp.float32, -bound2, bound2))
            b2[g, c] = np.asarray(
                jax.random.uniform(k4, (), jnp.float32, -bound2, bound2))
    return {
        "w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
        "w2": jnp.asarray(w2), "b2": jnp.asarray(b2),
    }


_LIMB_IDX, _LIMB_MASK = limb_combination_matrix()


def bone_refusion(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B,T,17,3] bone tokens -> [B,T,17,3] fused limb tokens.

    One gather + two einsums replace the reference's loop over 17
    heterogeneous BoneMLPs (`model/modules/bone_refusion.py:63-69`): group
    members are gathered via a dense (17,4) index table; both the inputs and
    the first-layer weights are masked so padded slots contribute nothing
    (and receive no gradient signal that would break the padding invariant).
    """
    idx = jnp.asarray(_LIMB_IDX)  # (G, K)
    mask = jnp.asarray(_LIMB_MASK, dtype=x.dtype)  # (G, K)
    gathered = x[..., idx, :]  # (B, T, G, K, 3)
    gathered = gathered * mask[..., :, None]
    w1 = p["w1"].astype(x.dtype) * mask[:, None, :, None]  # (G, 3, K, H)
    h = jnp.einsum("btgkc,gckh->btgch", gathered, w1) + p["b1"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    out = jnp.einsum("btgch,gch->btgc", h, p["w2"].astype(x.dtype))
    return out + p["b2"].astype(x.dtype)


# ------------------------------------------------------------ trunk layer


def trunk_layer_init(key: jax.Array, cfg: "KASportsFormerConfig"
                     ) -> tuple[Params, Params]:
    """One RepeatFormerPartWithBone: three (spatial, temporal) branch pairs —
    attention, graph, bone-cross-attention — plus the 3-way adaptive fusion
    gate (≙ `model/KASportsFormer.py:204-266`)."""
    names = ["att_spatial", "att_temporal", "graph_spatial", "graph_temporal",
             "bone_spatial", "bone_temporal"]
    mixers = ["attention", "attention", "graph", "graph", "bone", "bone"]
    modes = ["spatial", "temporal"] * 3
    params: Params = {}
    state: Params = {}
    for name, mixer, mode, k in zip(names, mixers, modes, jax.random.split(key, 6)):
        p, s = L.former_module_init(
            k, cfg.dim_feat, cfg.mlp_ratio, mixer, mode, cfg.num_heads,
            cfg.qkv_bias, cfg.layer_scale_init_value, cfg.n_frames)
        params[name] = p
        if s:
            state[name] = s
    params["fusion"] = L.adaptive_fusion_init(cfg.dim_feat, 3)
    return params, state


def trunk_layer_apply(p: Params, state: Params, x: jnp.ndarray,
                      bone_in: jnp.ndarray, x_limb: jnp.ndarray,
                      cfg: "KASportsFormerConfig", train: bool,
                      spatial_norm_adj: jnp.ndarray,
                      static_temporal_adj: jnp.ndarray | None = None
                      ) -> tuple[jnp.ndarray, Params]:
    """x_attn/x_graph from the fused stream, x_bone from `bone_in` cross-
    attending to the limb stream; adaptive 3-way fusion
    (≙ `model/KASportsFormer.py:268-286`)."""
    def fm(name, mixer, mode, inp, limb=None, st=None):
        return L.former_module(
            p[name], st if st is not None else {}, inp, mixer, mode,
            cfg.num_heads, train, x_limb=limb, qk_scale=cfg.qkv_scale,
            spatial_norm_adj=spatial_norm_adj, neighbour_num=cfg.neighbour_num,
            static_temporal_adj=static_temporal_adj,
            use_layer_scale=cfg.use_layer_scale)

    x_attn, _ = fm("att_spatial", "attention", "spatial", x)
    x_attn, _ = fm("att_temporal", "attention", "temporal", x_attn)

    x_graph, st_gs = fm("graph_spatial", "graph", "spatial", x,
                        st=state["graph_spatial"])
    x_graph, st_gt = fm("graph_temporal", "graph", "temporal", x_graph,
                        st=state["graph_temporal"])

    x_bone, _ = fm("bone_spatial", "bone", "spatial", bone_in, limb=x_limb)
    x_bone, _ = fm("bone_temporal", "bone", "temporal", x_bone, limb=x_limb)

    if cfg.use_adaptive_fusion:
        out = L.adaptive_fusion(p["fusion"], [x_attn, x_graph, x_bone])
    else:
        out = (x_attn + x_graph + x_bone) / 3
    new_state = {"graph_spatial": st_gs, "graph_temporal": st_gt}
    return out, new_state


# ------------------------------------------- fused trunk body (layers >= 1)
#
# Round-2 profiling (docs/ROUND_NOTES.md) put the trunk's thin-K linears —
# (tokens, 128) @ (128, 128..384) projections — at ~1/6 of the measured MXU
# rate, while widening the OUTPUT of a K=128 matmul is nearly free. The
# layers >= 1 body therefore restructures the reference's per-module
# formulation (without touching the parameter layout — fusion happens at
# apply time, in f32, as a pure reorder of the same math):
#
# * all three branches read the SAME stream x (the layer-0-only x_bone
#   routing, `model/KASportsFormer.py:332-336`, is honored by running layer
#   0 unrolled outside the scan), so their pre-mixer LayerNorms share one
#   normalize core x̂ and each branch's scale/bias folds into its first
#   projection:  LN(x) @ W == x̂ @ (s ⊙ W) + b @ W;
# * the folded projections concatenate into ONE (C, 6C)-wide matmul:
#   attention qkv (3C) | graph V (C) | graph U (C) | bone q (C);
# * the limb stream x_limb is loop-invariant, so its normalize core hoists
#   out of the scan entirely and both bone modules' K/V projections stack
#   into one (C, 4C) matmul per layer;
# * the 3-way fusion gate's input concat is algebraically split into three
#   (C, 3) matmuls (no (.., 3C) concat materialization).


def _norm_core(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm without affine params, f32 statistics, f32 result."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps)


def _fold_norm_linear(norm: Params, lin: Params) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold LayerNorm affine params into a following linear (leading layer
    axis broadcast): LN(x) @ W + b  ==  x̂ @ (scale ⊙ W) + (bias @ W + b)."""
    w = norm["scale"][..., :, None] * lin["w"]
    b = jnp.einsum("...c,...cn->...n", norm["bias"], lin["w"])
    if "b" in lin:
        b = b + lin["b"]
    return w, b


def fused_trunk_weights(lp: Params) -> Params:
    """Precompute the fused stage-1 and limb-KV weights for a (stacked)
    trunk-layer parameter pytree. Pure f32 reorders of the reference
    parameterization; computed once per forward, outside the layer scan."""
    w_qkv, b_qkv = _fold_norm_linear(lp["att_spatial"]["norm1"],
                                     lp["att_spatial"]["mixer"]["qkv"])
    w_v, b_v = _fold_norm_linear(lp["graph_spatial"]["norm1"],
                                 lp["graph_spatial"]["mixer"]["V"])
    w_u, b_u = _fold_norm_linear(lp["graph_spatial"]["norm1"],
                                 lp["graph_spatial"]["mixer"]["U"])
    w_qb, b_qb = _fold_norm_linear(lp["bone_spatial"]["norm1"],
                                   lp["bone_spatial"]["mixer"]["q"])
    w_kvs, b_kvs = _fold_norm_linear(lp["bone_spatial"]["norm1_limb"],
                                     lp["bone_spatial"]["mixer"]["kv"])
    w_kvt, b_kvt = _fold_norm_linear(lp["bone_temporal"]["norm1_limb"],
                                     lp["bone_temporal"]["mixer"]["kv"])
    return {
        "w1": jnp.concatenate([w_qkv, w_v, w_u, w_qb], axis=-1),
        "b1": jnp.concatenate([b_qkv, b_v, b_u, b_qb], axis=-1),
        # spatial and temporal KV kept separate: the temporal pair projects
        # off the TRANSPOSED limb core (tokens-major), so its K/V land
        # directly in the temporal kernel's layout with no per-layer
        # transposes
        "wkv_sp": w_kvs,
        "bkv_sp": b_kvs,
        "wkv_t": w_kvt,
        "bkv_t": b_kvt,
    }


def _mixer_tail(p: Params, x: jnp.ndarray, mixed: jnp.ndarray,
                use_layer_scale: bool, train: bool) -> jnp.ndarray:
    """The FormerModule residual tail: x + LS1*mixed; x + LS2*MLP(LN(x))."""
    if use_layer_scale:
        x = x + p["ls1"].astype(x.dtype) * mixed
    else:
        x = x + mixed
    return L.mlp_tail(p, x, use_layer_scale, train)


def fused_trunk_layer_apply(p: Params, fw: Params, state: Params,
                            x: jnp.ndarray, l_hat: jnp.ndarray,
                            l_hat_t: jnp.ndarray,
                            cfg: "KASportsFormerConfig", train: bool,
                            spatial_norm_adj: jnp.ndarray,
                            static_temporal_adj: jnp.ndarray | None = None
                            ) -> tuple[jnp.ndarray, Params]:
    """One trunk layer for layers >= 1 — numerically the same computation as
    `trunk_layer_apply` with bone_in == x, restructured for the MXU (see the
    section comment above). `l_hat` is the hoisted limb-stream normalize
    core (`l_hat_t` its (B, J, T, C) transpose, hoisted once for all layers);
    `fw` the per-layer `fused_trunk_weights` slice."""
    dtype = x.dtype
    c = cfg.dim_feat
    heads = cfg.num_heads
    scale = cfg.qkv_scale or (c // heads) ** -0.5
    use_ls = cfg.use_layer_scale
    _gate_split, _stage1, _hg_bf16, _ablate_branch = _trunk_knobs()

    xh_f32 = _norm_core(x)
    xh = xh_f32.astype(dtype)
    if _stage1 == "wide":
        big = xh @ fw["w1"].astype(dtype) + fw["b1"].astype(dtype)
        qkv_a = big[..., : 3 * c]
        v_g = big[..., 3 * c : 4 * c]
        u_g = big[..., 4 * c : 5 * c]
        q_b = big[..., 5 * c : 6 * c]
    else:
        # per-branch projections off the SHARED norm core: the three
        # branch LayerNorms differ only in affine params, so one stats
        # pass feeds all three (x̂*s_i + b_i == LN_i(x) exactly in f32)
        def affine(norm):
            return (xh_f32 * norm["scale"] + norm["bias"]).astype(dtype)

        qkv_a = L.linear(p["att_spatial"]["mixer"]["qkv"],
                         affine(p["att_spatial"]["norm1"]))
        h_gs = affine(p["graph_spatial"]["norm1"])
        v_g = L.linear(p["graph_spatial"]["mixer"]["V"], h_gs)
        u_g = L.linear(p["graph_spatial"]["mixer"]["U"], h_gs)
        q_b = L.linear(p["bone_spatial"]["mixer"]["q"],
                       affine(p["bone_spatial"]["norm1"]))
    kv_sp = l_hat @ fw["wkv_sp"].astype(dtype) + fw["bkv_sp"].astype(dtype)
    k_sp, v_sp = jnp.split(kv_sp, 2, axis=-1)
    # temporal bone K/V project off the transposed limb core: tokens-major
    # from birth, no transposes around the temporal kernel call
    kv_t = l_hat_t @ fw["wkv_t"].astype(dtype) + fw["bkv_t"].astype(dtype)
    k_t, v_t = jnp.split(kv_t, 2, axis=-1)

    # --- attention branch. The temporal FormerModule runs entirely in
    # tokens-major (B, J, T, C) layout — one stream transpose in and one
    # out, instead of 3 q/k/v transposes + 1 core transpose around the
    # kernel (LN/linears/MLP only touch the channel axis, so the layout is
    # free for them; math identical to L.former_module).
    p_as, p_at = p["att_spatial"], p["att_temporal"]
    q, k, v = jnp.split(qkv_a, 3, axis=-1)
    core = L._sdpa(q, k, v, scale, "spatial", heads)
    x_attn = _mixer_tail(p_as, x, L.linear(p_as["mixer"]["proj"], core),
                         use_ls, train)
    xt = _stream_transpose(x_attn)
    qkv_t = L.linear(p_at["mixer"]["qkv"], L.layer_norm(p_at["norm1"], xt))
    q2, k2, v2 = jnp.split(qkv_t, 3, axis=-1)
    core = L._sdpa_tokens(q2, k2, v2, scale, heads)
    x_attn = _mixer_tail(p_at, xt, L.linear(p_at["mixer"]["proj"], core),
                         use_ls, train).transpose(0, 2, 1, 3)

    # --- graph branch (spatial GCN inline: V/U came from the fused matmul)
    p_gs = p["graph_spatial"]
    b_, t_, j_, _ = x.shape
    if _stage1 != "wide":
        h_g = h_gs  # already computed off the shared norm core
    elif _hg_bf16:
        h_g = (xh * p_gs["norm1"]["scale"].astype(dtype)
               + p_gs["norm1"]["bias"].astype(dtype))
    else:
        h_g = (xh_f32 * p_gs["norm1"]["scale"]
               + p_gs["norm1"]["bias"]).astype(dtype)
    agg = jnp.einsum("jk,btkc->btjc", spatial_norm_adj.astype(dtype), v_g)
    pre = (agg + u_g).reshape(b_ * t_, j_, c)
    normed, st_gs_bn = L.batch_norm_nodes(
        p_gs["mixer"]["bn"], state["graph_spatial"]["bn"], pre, train)
    gout = jax.nn.relu(h_g.reshape(b_ * t_, j_, c) + normed)
    x_graph = _mixer_tail(p_gs, x, gout.reshape(b_, t_, j_, c), use_ls,
                          train)
    x_graph, st_gt = L.former_module(
        p["graph_temporal"], state["graph_temporal"], x_graph, "graph",
        "temporal", heads, train, neighbour_num=cfg.neighbour_num,
        static_temporal_adj=static_temporal_adj, use_layer_scale=use_ls)

    # --- bone branch (cross-attention; K/V precomputed from the limb
    # stream; the temporal module runs tokens-major like att_temporal, with
    # its K/V already in that layout from the transposed limb core)
    p_bs, p_bt = p["bone_spatial"], p["bone_temporal"]
    core = L._sdpa(q_b, k_sp, v_sp, scale, "spatial", heads)
    x_bone = _mixer_tail(p_bs, x, L.linear(p_bs["mixer"]["proj"], core),
                         use_ls, train)
    xbt = _stream_transpose(x_bone)
    q_t = L.linear(p_bt["mixer"]["q"], L.layer_norm(p_bt["norm1"], xbt))
    core = L._sdpa_tokens(q_t, k_t, v_t, scale, heads)
    x_bone = _mixer_tail(p_bt, xbt, L.linear(p_bt["mixer"]["proj"], core),
                         use_ls, train).transpose(0, 2, 1, 3)

    if _ablate_branch == "att":
        x_attn = x
    elif _ablate_branch == "graph":
        x_graph = x
    elif _ablate_branch == "bone":
        x_bone = x

    # --- adaptive 3-way fusion, concat split into per-branch gate matmuls
    if cfg.use_adaptive_fusion:
        if _gate_split:
            wf = p["fusion"]["w"].astype(dtype)
            logits = (x_attn @ wf[:c] + x_graph @ wf[c : 2 * c]
                      + x_bone @ wf[2 * c :] + p["fusion"]["b"].astype(dtype))
            alpha = jax.nn.softmax(logits, axis=-1)
            out = (x_attn * alpha[..., 0:1] + x_graph * alpha[..., 1:2]
                   + x_bone * alpha[..., 2:3])
        else:
            out = L.adaptive_fusion(p["fusion"], [x_attn, x_graph, x_bone])
    else:
        out = (x_attn + x_graph + x_bone) / 3
    new_state = {"graph_spatial": {"bn": st_gs_bn}, "graph_temporal": st_gt}
    return out, new_state


# ------------------------------------------------------------ full model


@dataclasses.dataclass(frozen=True)
class KASportsFormerConfig:
    """Model hyperparameters (defaults = the public YAML,
    `configs/sportspose-gt-kasportsformer.yaml:70-92`)."""

    n_layers: int = 26
    dim_in: int = 3
    dim_feat: int = 128
    dim_rep: int = 512
    dim_out: int = 3
    mlp_ratio: float = 4.0
    num_heads: int = 8
    qkv_bias: bool = False
    qkv_scale: float | None = None
    num_joints: int = 17
    n_frames: int = 27
    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-5
    use_adaptive_fusion: bool = True
    use_temporal_similarity: bool = True
    neighbour_num: int = 4
    temporal_connection_len: int = 1
    hierarchical: bool = False
    # trunk lax.scan unroll factor: >1 lets XLA fuse across layer
    # boundaries at the cost of compile time (1 = fully rolled)
    scan_unroll: int = 1
    # activation names the trunk remat policy saves for backward (see
    # `apply`); None disables remat entirely (save-everything — cheapest
    # backward, largest activation memory). "mlp_hidden" is the next rung:
    # +~9 GB at batch 256 on the full model, skips the fc1 replays.
    remat_names: tuple[str, ...] | None = ("attn_core", "gcn_agg")
    # scan body formulation for layers >= 1: the MXU-fused body
    # (`fused_trunk_layer_apply`) vs the per-module reference formulation
    # (`trunk_layer_apply`) — numerically equivalent, kept for A/B
    fused_trunk: bool = True


class KASportsFormer:
    """Functional model wrapper: `init(key) -> (params, state)`,
    `apply(params, state, x, train) -> (y, new_state)`."""

    def __init__(self, cfg: KASportsFormerConfig | None = None,
                 compute_dtype: jnp.dtype = jnp.float32):
        self.cfg = cfg or KASportsFormerConfig()
        self.compute_dtype = compute_dtype
        # Constant: degree-normalized skeleton adjacency (the reference
        # recomputes this identical matrix per batch element per layer).
        # Pure numpy so no device work happens at model construction.
        adj = spatial_adjacency(self.cfg.num_joints)
        dinv = adj.sum(-1) ** -0.5
        # numpy on purpose: becomes a folded constant under jit
        self.spatial_norm_adj = (adj * dinv[:, None] * dinv[None, :]).astype(np.float32)
        # use_temporal_similarity=False switches the temporal GCN to the
        # reference's static banded frame adjacency
        # (`model/modules/graph.py:43-44,63-75`)
        self.static_temporal_adj = (
            None if self.cfg.use_temporal_similarity
            else L.temporal_adjacency(self.cfg.n_frames,
                                      self.cfg.temporal_connection_len))

    # -- init ----------------------------------------------------------
    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        params: Params = {
            "joints_embed": L.linear_init(keys[0], cfg.dim_in, cfg.dim_feat),
            "bone_embed": L.linear_init(keys[1], cfg.dim_in, cfg.dim_feat),
            "limb_embed": L.linear_init(keys[2], cfg.dim_in, cfg.dim_feat),
            "pos_embed": jnp.zeros((1, cfg.num_joints, cfg.dim_feat), jnp.float32),
            "bone_pos_embed": jnp.zeros((1, cfg.num_joints, cfg.dim_feat), jnp.float32),
            "limb_pos_embed": jnp.zeros((1, cfg.num_joints, cfg.dim_feat), jnp.float32),
            "bone_refusion": bone_refusion_init(keys[3]),
            "norm": L.layer_norm_init(cfg.dim_feat),
            "rep_logit": L.linear_init(keys[4], cfg.dim_feat, cfg.dim_rep),
            "head": L.linear_init(keys[5], cfg.dim_rep, cfg.dim_out),
        }
        layer_keys = jax.random.split(keys[6], cfg.n_layers)
        per_layer = [trunk_layer_init(k, cfg) for k in layer_keys]
        # Stack layer params/state along a leading axis for lax.scan.
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *[p for p, _ in per_layer])
        state = {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *[s for _, s in per_layer])}
        return params, state

    # -- apply ---------------------------------------------------------
    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False, return_rep: bool = False
              ) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        dtype = self.compute_dtype
        x = x.astype(dtype)

        x_bone = bone_decomposer(x)
        x_limb = bone_refusion(params["bone_refusion"], x)

        x = L.linear(params["joints_embed"], x) + params["pos_embed"].astype(dtype)
        x_bone = (L.linear(params["bone_embed"], x_bone)
                  + params["bone_pos_embed"].astype(dtype))
        x_limb = (L.linear(params["limb_embed"], x_limb)
                  + params["limb_pos_embed"].astype(dtype))

        # 26-layer trunk: layer 0 runs unrolled (its bone branch reads the
        # embedded bone stream, `model/KASportsFormer.py:332-336`); layers
        # >= 1 all read the fused stream, so they run as a lax.scan over the
        # MXU-restructured fused body (see `fused_trunk_layer_apply`).
        adj = self.spatial_norm_adj
        t_adj = self.static_temporal_adj
        if cfg.remat_names is None:
            def remat(f):
                return f
        else:
            remat = functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *cfg.remat_names))

        layer0_p = jax.tree.map(lambda a: a[0], params["layers"])
        layer0_s = jax.tree.map(lambda a: a[0], state["layers"])
        x, st0 = remat(
            lambda xx, bb: trunk_layer_apply(
                layer0_p, layer0_s, xx, bb, x_limb, cfg, train, adj,
                static_temporal_adj=t_adj))(x, x_bone)

        if cfg.n_layers > 1:
            rest_p = jax.tree.map(lambda a: a[1:], params["layers"])
            rest_s = jax.tree.map(lambda a: a[1:], state["layers"])
            fw = fused_trunk_weights(rest_p)
            # hoisted: the limb stream is loop-invariant, its normalize core
            # (and the tokens-major transpose the temporal bone K/V project
            # from) is computed once for all 25 scanned layers
            l_hat = _norm_core(x_limb).astype(dtype)
            l_hat_t = l_hat.transpose(0, 2, 1, 3)

            # remat the layer body: without it the scan saves every layer's
            # activations for backward (26 x (B,27,17,512) MLP temps = ~9 GB
            # at batch 256), blowing HBM. The policy keeps the
            # attention-core outputs (the expensive recompute) and replays
            # the cheap linears/norms.
            @remat
            def body(carry, step):
                layer_params, layer_state, layer_fw = step
                if cfg.fused_trunk:
                    out, new_state = fused_trunk_layer_apply(
                        layer_params, layer_fw, layer_state, carry, l_hat,
                        l_hat_t, cfg, train, adj, static_temporal_adj=t_adj)
                else:
                    out, new_state = trunk_layer_apply(
                        layer_params, layer_state, carry, carry, x_limb, cfg,
                        train, adj, static_temporal_adj=t_adj)
                return out, new_state

            x, rest_states = jax.lax.scan(
                body, x, (rest_p, rest_s, fw), unroll=cfg.scan_unroll)
            new_layer_states = jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                st0, rest_states)
        else:
            new_layer_states = jax.tree.map(lambda a: a[None], st0)

        x = L.layer_norm(params["norm"], x)
        x = jnp.tanh(L.linear(params["rep_logit"], x))
        if return_rep:
            return x, {"layers": new_layer_states}
        y = L.linear(params["head"], x)
        return y.astype(jnp.float32), {"layers": new_layer_states}

    def parameter_count(self, params: Params) -> int:
        """Effective parameter count. The dense BoneRefusion first-layer
        weight is zero-padded to the max combination width; padded slots are
        structurally masked (never used, never updated), so they are excluded
        — making the count comparable to the reference's ragged layout
        (29,365,668 with the public config, `model/model_tools.py:100-104`).
        """
        total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        w1 = params["bone_refusion"]["w1"]  # (G, 3, Kmax, H)
        real = int(_LIMB_MASK.sum()) * w1.shape[1] * w1.shape[3]
        return total - int(np.prod(w1.shape)) + real
