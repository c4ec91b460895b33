"""Functional layer library (pure jnp; params are plain pytrees).

These are ground-up JAX formulations of the blocks the reference implements
as torch modules (`model/modules/*.py`):

* `attention` — spatial/temporal factored MHSA over a [B,T,J,C] stream
  (≙ `model/modules/selfattention.py`), expressed as einsums so XLA batches
  the tiny 17x17 / 27x27 attention matmuls onto the MXU;
* `cross_attention` — Q from one stream, K/V from another
  (≙ `model/modules/bone_crossattention.py`);
* `gcn` — graph mixer with a precomputed degree-normalized skeleton adjacency
  in spatial mode and a dynamic top-k-similarity adjacency in temporal mode
  (≙ `model/modules/graph.py`), with per-node batch norm carried as explicit
  state instead of module buffers;
* `mlp`, `layer_norm`, `former_module` — the pre-LN metaformer wrapper with
  LayerScale (≙ `model/KASportsFormer.py:65-118`).

Initialization reproduces torch defaults (U(-1/sqrt(in), 1/sqrt(in)) linears,
the GCN's N(0, sqrt(2/in)) U/V, zeros/ones norms) so training-from-scratch
matches the reference recipe and converted torch checkpoints drop in.
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Params = dict[str, Any]

# ---------------------------------------------------------------- primitives


def linear_init(key: jax.Array, dim_in: int, dim_out: int, bias: bool = True,
                w_init: str = "torch") -> Params:
    """Weight stored (in, out) for `x @ w`. `w_init`:
    'torch'  — U(-1/sqrt(in), 1/sqrt(in)) (torch nn.Linear default),
    'gcn'    — N(0, sqrt(2/in)) (reference GCN._init_gcn),
    'zeros'  — zeros (adaptive-fusion gate weight)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(dim_in)
    if w_init == "torch":
        w = jax.random.uniform(kw, (dim_in, dim_out), jnp.float32, -bound, bound)
    elif w_init == "gcn":
        w = jax.random.normal(kw, (dim_in, dim_out), jnp.float32) * math.sqrt(
            2.0 / dim_in
        )
    elif w_init == "zeros":
        w = jnp.zeros((dim_in, dim_out), jnp.float32)
    else:
        raise ValueError(w_init)
    p = {"w": w}
    if bias:
        p["b"] = jax.random.uniform(kb, (dim_out,), jnp.float32, -bound, bound)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; statistics in float32 for bf16 safety."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def mlp_init(key: jax.Array, dim_in: int, hidden: int, dim_out: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim_in, hidden),
        "fc2": linear_init(k2, hidden, dim_out),
    }


def mlp(p: Params, x: jnp.ndarray, fused: bool = False) -> jnp.ndarray:
    """fc1 -> GELU -> fc2 (dropout-free: all shipped configs use drop=0;
    torch GELU default is the exact erf form). The hidden is named for remat
    policies (no-op unless a surrounding jax.checkpoint saves 'mlp_hidden').

    `fused=True` routes through the Pallas fused-MLP kernel on TPU
    (hidden stays in VMEM — `ops/mlp.py`); callers enable it on inference
    paths, while training keeps the XLA form whose named hidden the trunk
    remat policy saves."""
    if fused:
        from kasportsformer_tpu.ops.mlp import fused_mlp

        return fused_mlp(x, p["fc1"]["w"], p["fc1"]["b"],
                         p["fc2"]["w"], p["fc2"]["b"])
    h = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    return linear(p["fc2"], checkpoint_name(h, "mlp_hidden"))


def mlp_tail(p: Params, x: jnp.ndarray, use_layer_scale: bool,
             train: bool) -> jnp.ndarray:
    """The FormerModule MLP tail: x + [ls2 ⊙] MLP(LN_norm2(x)).

    Inference on TPU routes through the LN-folded Pallas kernel
    (`ops/mlp.py:fused_mlp_ln`) — LN, both matmuls, GELU, LayerScale and the
    residual add in one VMEM pass. Training keeps the XLA form whose named
    'mlp_hidden' the trunk remat policy saves."""
    if os.environ.get("KASF_ABLATE") == "mlp":
        # profiling-only: drop every MLP tail so XLA dead-code-eliminates
        # the sub-block — in-model attribution (docs/ROUND_NOTES.md)
        return x
    # Training routes through the fused kernels too (default on): the
    # custom VJP runs the fused BACKWARD kernel on TPU (in-VMEM recompute +
    # grid-accumulated weight grads — ops/mlp.py), measured +22% train
    # step (180 -> 219 clips/s at batch 128) with the 'mlp_tail' remat
    # policy. KASF_TRAIN_FUSED_MLP=0 restores the XLA form whose named
    # 'mlp_hidden' legacy policies save.
    if not train or os.environ.get("KASF_TRAIN_FUSED_MLP", "1") != "0":
        from kasportsformer_tpu.ops.mlp import fused_mlp_ln

        mp, np_ = p["mlp"], p["norm2"]
        ls2 = (p["ls2"] if use_layer_scale
               else jnp.ones((x.shape[-1],), jnp.float32))
        out = fused_mlp_ln(x, np_["scale"], np_["bias"],
                           mp["fc1"]["w"], mp["fc1"]["b"],
                           mp["fc2"]["w"], mp["fc2"]["b"], ls2, 1e-5)
        # named for remat policies: saving 'mlp_tail' (15 MB/tail at batch
        # 128 vs 60 MB for the hidden) lets the backward replay skip
        # re-running the tail kernel entirely — its Pallas VJP recomputes
        # everything it needs in VMEM from x and the weights
        return checkpoint_name(out, "mlp_tail")
    y = mlp(p["mlp"], layer_norm(p["norm2"], x), fused=False)
    if use_layer_scale:
        return x + p["ls2"].astype(x.dtype) * y
    return x + y


# ---------------------------------------------------------------- attention


def attention_init(key: jax.Array, dim: int, qkv_bias: bool = False) -> Params:
    kq, kp = jax.random.split(key)
    return {
        "qkv": linear_init(kq, dim, dim * 3, bias=qkv_bias),
        "proj": linear_init(kp, dim, dim),
    }


def _sdpa_tokens(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                 num_heads: int) -> jnp.ndarray:
    """Multi-head SDPA over the second-to-last axis of (..., N, C) streams.

    TPU-native formulation: instead of splitting channels into H heads of
    tiny width D (which puts D=C/H in the minor/lane dimension — measured
    ~8x padding waste and 6+ ms per call at batch 256), the keys/values are
    expanded against a (C, H) head mask so BOTH attention matmuls contract
    over the full C channels (MXU-aligned):

        km[..., c, (h, j)] = k[..., j, c] * mask[c, h]
        logits[..., i, (h, j)] = sum_c q[..., i, c] * km[..., c, (h, j)]

    which equals the per-head logits exactly (masked channels contribute
    zeros). On TPU with 4-D inputs this dispatches to the Pallas kernel in
    `ops/attention.py`, which keeps the head expansion entirely in VMEM
    (another ~2.5x: the XLA form is HBM-bound on the ~1 MB/clip expansion);
    elsewhere it runs the pure-XLA masked form.

    Under an open `parallel.tensor_parallel(mesh)` context (trace-time) a
    4-D call routes through the shard_map'd TP kernel instead: each chip
    runs on its local contiguous head shard with no collectives, rather
    than XLA all-gathering q/k/v around the replicated-spec pallas_call
    (the Megatron all-reduce stays at the following proj matmul, inserted
    by pjit from `parallel.param_shardings`).
    """
    from kasportsformer_tpu import parallel
    from kasportsformer_tpu.ops.attention import masked_sdpa, masked_sdpa_tp

    tp = parallel.active_tp()
    if tp is not None and q.ndim == 4:
        mesh, interpret = tp
        tp_size = mesh.shape[parallel.MODEL_AXIS]
        if num_heads % tp_size == 0 and q.shape[-1] % num_heads == 0:
            out = masked_sdpa_tp(q, k, v, scale, num_heads, mesh,
                                 axis_name=parallel.MODEL_AXIS,
                                 force_pallas_interpret=interpret)
            return checkpoint_name(out, "attn_core")
    out = masked_sdpa(q, k, v, scale, num_heads)
    # named for remat policies: the trunk saves attention-core outputs so the
    # backward replays only the cheap linears/norms (see kasportsformer.py)
    return checkpoint_name(out, "attn_core")


def _sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
          axis: str, num_heads: int) -> jnp.ndarray:
    """Factored spatial/temporal attention on (B, T, J, C) streams: 'spatial'
    attends over J per (B, T); 'temporal' over T per (B, J)."""
    if axis == "spatial":
        return _sdpa_tokens(q, k, v, scale, num_heads)
    if axis == "temporal":
        # the group/token swap happens as HBM transposes around the kernel
        # on purpose: an in-kernel VMEM swap (tokens-major variant, retired
        # round 3 — numbers in docs/ROUND_NOTES.md) measured slower.
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = _sdpa_tokens(qt, kt, vt, scale, num_heads)
        return out.transpose(0, 2, 1, 3)
    raise ValueError(axis)


def attention(p: Params, x: jnp.ndarray, num_heads: int, mode: str,
              qk_scale: float | None = None) -> jnp.ndarray:
    """Self-attention on [B,T,J,C] (≙ `model/modules/selfattention.py:44-60`)."""
    c = x.shape[-1]
    scale = qk_scale or (c // num_heads) ** -0.5
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _sdpa(q, k, v, scale, mode, num_heads)
    return linear(p["proj"], out)


def attention_tokens(p: Params, x: jnp.ndarray, num_heads: int,
                     qk_scale: float | None = None) -> jnp.ndarray:
    """Standard MHSA on a flat token stream (M, N, C) — the building block of
    the MixSTE/DSTFormer family (`model/MixSTE.py:61-106`), where M batches
    whatever axis isn't being attended over. Uses the head-masked full-C
    contraction (see `_sdpa_tokens`)."""
    c = x.shape[-1]
    scale = qk_scale or (c // num_heads) ** -0.5
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _sdpa_tokens(q, k, v, scale, num_heads)
    return linear(p["proj"], out)


def transformer_block_init(key: jax.Array, dim: int, mlp_ratio: float,
                           qkv_bias: bool) -> Params:
    """Pre-LN transformer block params (`model/MixSTE.py:299-342`)."""
    ka, km = jax.random.split(key)
    return {
        "norm1": layer_norm_init(dim),
        "attn": attention_init(ka, dim, qkv_bias),
        "norm2": layer_norm_init(dim),
        "mlp": mlp_init(km, dim, int(dim * mlp_ratio), dim),
    }


def transformer_block(p: Params, x: jnp.ndarray, num_heads: int,
                      qk_scale: float | None = None, eps: float = 1e-5,
                      drop_path_rate: float = 0.0,
                      key: jax.Array | None = None) -> jnp.ndarray:
    """x + attn(LN(x)); x + mlp(LN(x)) on (M, N, C) tokens. Stochastic depth
    (per-sample residual drop, `timm` semantics) applies only when a key is
    given and rate > 0 (training)."""

    def residual(branch: jnp.ndarray, subkey) -> jnp.ndarray:
        if drop_path_rate > 0.0 and subkey is not None:
            keep = 1.0 - drop_path_rate
            mask = jax.random.bernoulli(subkey, keep, (branch.shape[0], 1, 1))
            branch = branch * mask.astype(branch.dtype) / keep
        return branch

    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    x = x + residual(attention_tokens(p["attn"], layer_norm(p["norm1"], x, eps),
                                      num_heads, qk_scale), k1)
    return mlp_ln_residual(p["norm2"], p["mlp"], x, eps,
                           drop_path_rate=drop_path_rate, key=k2)


def mlp_ln_residual(p_norm: Params, p_mlp: Params, x: jnp.ndarray,
                    eps: float = 1e-5, drop_path_rate: float = 0.0,
                    key: jax.Array | None = None) -> jnp.ndarray:
    """x + MLP(LN(x)) — the zoo blocks' shared MLP tail. Without an active
    stochastic-depth mask this routes through the LN-folded Pallas kernel
    (`ops/mlp.py:fused_mlp_ln`, ls2=1): LN, both matmuls, GELU and the
    residual add in one VMEM pass (the same kernel the flagship's tails
    use); its custom VJP runs the fused backward kernel under training.
    With drop-path active the per-sample mask sits between the MLP and the
    residual add, which the fused form cannot express — XLA form."""
    if drop_path_rate > 0.0 and key is not None:
        y = mlp(p_mlp, layer_norm(p_norm, x, eps))
        keep = 1.0 - drop_path_rate
        mask = jax.random.bernoulli(key, keep, (y.shape[0],) + (1,) * (y.ndim - 1))
        return x + y * mask.astype(y.dtype) / keep
    from kasportsformer_tpu.ops.mlp import fused_mlp_ln

    fc1, fc2 = p_mlp["fc1"], p_mlp["fc2"]
    b1 = fc1.get("b", jnp.zeros((fc1["w"].shape[1],), jnp.float32))
    b2 = fc2.get("b", jnp.zeros((fc2["w"].shape[1],), jnp.float32))
    ls2 = jnp.ones((x.shape[-1],), jnp.float32)
    return fused_mlp_ln(x, p_norm["scale"], p_norm["bias"],
                        fc1["w"], b1, fc2["w"], b2, ls2, eps)


def cross_attention_init(key: jax.Array, dim: int, qkv_bias: bool = False) -> Params:
    kq, kkv, kp = jax.random.split(key, 3)
    return {
        "q": linear_init(kq, dim, dim, bias=qkv_bias),
        "kv": linear_init(kkv, dim, dim * 2, bias=qkv_bias),
        "proj": linear_init(kp, dim, dim),
    }


def cross_attention(p: Params, x: jnp.ndarray, x_kv: jnp.ndarray, num_heads: int,
                    mode: str, qk_scale: float | None = None) -> jnp.ndarray:
    """Q from `x`, K/V from `x_kv`
    (≙ `model/modules/bone_crossattention.py:43-62`)."""
    c = x.shape[-1]
    scale = qk_scale or (c // num_heads) ** -0.5
    q = linear(p["q"], x)
    k, v = jnp.split(linear(p["kv"], x_kv), 2, axis=-1)
    out = _sdpa(q, k, v, scale, mode, num_heads)
    return linear(p["proj"], out)


# ---------------------------------------------------------------- GCN


def batch_norm_init(num_features: int) -> tuple[Params, Params]:
    """Affine params + running-stat state for per-node batch norm."""
    params = {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def batch_norm_nodes(p: Params, state: Params, x: jnp.ndarray, train: bool,
                     momentum: float = 0.1, eps: float = 1e-5
                     ) -> tuple[jnp.ndarray, Params]:
    """Per-node batch norm on (N, nodes, C): statistics over the (N, C) axes
    per node — torch BatchNorm1d(num_nodes) semantics from
    `model/modules/graph.py:37`, where the *node* axis plays the channel role.

    In training, statistics are computed over the full (possibly sharded)
    batch — i.e. cross-replica/"sync" BN. The reference's DataParallel computes
    per-replica statistics instead; for single-device training they coincide,
    and the synced form is the better-defined choice on a TPU mesh (it is the
    statistics of the *logical* batch regardless of mesh size).
    """
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 2))
        var = jnp.mean(jnp.square(xf - mean[None, :, None]), axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + eps)
    y = y * p["scale"][None, :, None] + p["bias"][None, :, None]
    return y.astype(x.dtype), new_state


def temporal_adjacency(n_frames: int, connection_len: int = 1) -> np.ndarray:
    """Static temporal adjacency: frame i connects to itself and the next
    `connection_len` frames (no wraparound), the banded matrix the reference
    builds in `model/modules/graph.py:63-75` (`_init_temporal_adj`) and uses
    when `use_temporal_similarity=False` (`:104-116`). Pure numpy — a folded
    constant under jit."""
    adj = np.zeros((n_frames, n_frames), np.float32)
    for i in range(n_frames):
        adj[i, i : min(i + connection_len + 1, n_frames)] = 1.0
    return adj


def normalize_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """Symmetric degree normalization D^-1/2 A D^-1/2 applied row-wise with
    the same broadcasting as `model/modules/graph.py:77-90` (the reference
    multiplies D^-1/2 A D^-1/2 where both D factors use the *row* degree)."""
    deg = jnp.sum(adj, axis=-1)  # (..., N)
    dinv = deg**-0.5
    # norm_deg_matrix = diag(dinv); norm = diag @ adj @ diag
    return adj * dinv[..., :, None] * dinv[..., None, :]


def gcn_init(key: jax.Array, dim_in: int, dim_out: int, num_nodes: int
             ) -> tuple[Params, Params]:
    ku, kv = jax.random.split(key)
    bn_p, bn_s = batch_norm_init(num_nodes)
    params = {
        "U": linear_init(ku, dim_in, dim_out, w_init="gcn"),
        "V": linear_init(kv, dim_in, dim_out, w_init="gcn"),
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def gcn(p: Params, state: Params, x: jnp.ndarray, mode: str, train: bool,
        spatial_norm_adj: jnp.ndarray | None = None, neighbour_num: int = 4,
        static_temporal_adj: jnp.ndarray | None = None
        ) -> tuple[jnp.ndarray, Params]:
    """Graph mixer on [B,T,J,C] (≙ `model/modules/graph.py:99-134`).

    spatial: fixed skeleton adjacency — its degree normalization is constant,
    so `spatial_norm_adj` is precomputed once at model build (the reference
    recomputes the same normalization per batch element).
    temporal: dynamic adjacency from top-k feature similarity per (batch,
    joint) sequence, normalized per instance.
    Update: relu(x + BN(norm_adj @ V(x) + U(x))) (dim_in == dim_out here).
    """
    b, t, j, c = x.shape
    if mode == "spatial":
        tokens = x.reshape(b * t, j, c)  # nodes = joints
        norm_adj = spatial_norm_adj.astype(x.dtype)
        agg = jnp.einsum("jk,nkc->njc", norm_adj, linear(p["V"], tokens))
    elif mode == "temporal":
        tokens = x.transpose(0, 2, 1, 3).reshape(b * j, t, c)  # nodes = frames
        if static_temporal_adj is not None:
            norm_adj = normalize_adjacency(static_temporal_adj).astype(x.dtype)
            agg = jnp.einsum("ts,nsc->ntc", norm_adj, linear(p["V"], tokens))
        elif os.environ.get("KASF_ABLATE") == "gcnt":
            # profiling-only: skip the dynamic similarity/top-k adjacency
            # build + aggregation (attribution of the temporal GCN's
            # data-dependent part)
            agg = linear(p["V"], tokens)
        else:
            sim = jnp.einsum("ntc,nsc->nts", tokens, tokens)
            # k-th largest via iterative max (VPU) — lax.top_k costs ~20x
            # more here (measured 1.9 ms vs 0.09 ms at batch 256); equal to
            # top_k's threshold except on exact ties among the top-k, where
            # this admits the tied values too (degenerate inputs only).
            s = sim.astype(jnp.float32)
            for _ in range(neighbour_num - 1):
                m = jnp.max(s, axis=-1, keepdims=True)
                s = jnp.where(s >= m, -jnp.inf, s)
            kth = jnp.max(s, axis=-1, keepdims=True).astype(sim.dtype)
            adj = (sim >= kth).astype(x.dtype)  # (BJ, T, T)
            norm_adj = normalize_adjacency(adj)
            agg = jnp.einsum("nts,nsc->ntc", norm_adj, linear(p["V"], tokens))
            # saved by the trunk's remat policy: saving agg avoids re-running
            # the similarity/top-k adjacency build when downstream
            # activations are rematerialized (the aggregation einsum's own
            # VJP still reads norm_adj, so the build is not skipped in the
            # backward itself)
            agg = checkpoint_name(agg, "gcn_agg")
    else:
        raise ValueError(mode)

    pre = agg + linear(p["U"], tokens)
    normed, new_bn = batch_norm_nodes(p["bn"], state["bn"], pre, train)
    out = jax.nn.relu(tokens + normed)
    if mode == "spatial":
        out = out.reshape(b, t, j, c)
    else:
        out = out.reshape(b, j, t, c).transpose(0, 2, 1, 3)
    return out, {"bn": new_bn}


# ---------------------------------------------------------------- former block


def former_module_init(key: jax.Array, dim: int, mlp_ratio: float, mixer_type: str,
                       mode: str, num_heads: int, qkv_bias: bool,
                       layer_scale_init: float, n_frames: int,
                       with_limb_norm: bool = True,
                       use_layer_scale: bool = True) -> tuple[Params, Params]:
    """Pre-LN metaformer block params (≙ `model/KASportsFormer.py:65-101`;
    with_limb_norm=False gives MotionAGFormer's AGFormerBlock,
    `model/MotionAGFormer.py:14-50`, which has no norm1_limb). In
    KASportsFormer `norm1_limb` exists for every mixer type (allocated
    unconditionally at `:73`), keeping checkpoint layouts aligned."""
    km, kmlp = jax.random.split(key)
    state: Params = {}
    if mixer_type == "attention":
        mixer = attention_init(km, dim, qkv_bias)
    elif mixer_type == "graph":
        num_nodes = 17 if mode == "spatial" else n_frames
        mixer, state = gcn_init(km, dim, dim, num_nodes)
    elif mixer_type == "bone":
        mixer = cross_attention_init(km, dim, qkv_bias)
    elif mixer_type == "ms-tcn":
        mixer, state = multi_scale_tcn_init(km, dim, dim)
    else:
        raise ValueError(mixer_type)
    params = {
        "norm1": layer_norm_init(dim),
        "norm2": layer_norm_init(dim),
        "mixer": mixer,
        "mlp": mlp_init(kmlp, dim, int(dim * mlp_ratio), dim),
    }
    if with_limb_norm:
        params["norm1_limb"] = layer_norm_init(dim)
    if use_layer_scale:
        params["ls1"] = layer_scale_init * jnp.ones((dim,), jnp.float32)
        params["ls2"] = layer_scale_init * jnp.ones((dim,), jnp.float32)
    return params, state


def former_module(p: Params, state: Params, x: jnp.ndarray, mixer_type: str,
                  mode: str, num_heads: int, train: bool,
                  x_limb: jnp.ndarray | None = None,
                  qk_scale: float | None = None,
                  spatial_norm_adj: jnp.ndarray | None = None,
                  neighbour_num: int = 4,
                  static_temporal_adj: jnp.ndarray | None = None,
                  use_layer_scale: bool = True) -> tuple[jnp.ndarray, Params]:
    """x + LS1*mixer(LN(x)[, LN_limb(x_limb)]); x + LS2*MLP(LN(x))
    (≙ `model/KASportsFormer.py:103-118`; drop_path=0 in all configs).

    The attention CORE dispatches to a Pallas kernel on TPU (see
    `_sdpa_tokens`); the surrounding linears/LN/MLP stay in XLA on purpose —
    a fully-fused per-element module kernel exists (ops/former_module.py)
    but measured SLOWER (4.0 vs 3.3 ms/module at batch 256): XLA batches the
    qkv/proj/MLP matmuls across the whole batch at high MXU utilization,
    which per-element fusion gives up."""
    new_state = state
    h = layer_norm(p["norm1"], x)
    if mixer_type == "attention":
        mixed = attention(p["mixer"], h, num_heads, mode, qk_scale)
    elif mixer_type == "graph":
        mixed, new_state = gcn(
            p["mixer"], state, h, mode, train,
            spatial_norm_adj=spatial_norm_adj, neighbour_num=neighbour_num,
            static_temporal_adj=static_temporal_adj,
        )
    elif mixer_type == "bone":
        h_limb = layer_norm(p["norm1_limb"], x_limb)
        mixed = cross_attention(p["mixer"], h, h_limb, num_heads, mode, qk_scale)
    elif mixer_type == "ms-tcn":
        mixed, new_state = multi_scale_tcn(p["mixer"], state, h, train)
    else:
        raise ValueError(mixer_type)

    if use_layer_scale:
        x = x + p["ls1"].astype(x.dtype) * mixed
    else:
        x = x + mixed
    return mlp_tail(p, x, use_layer_scale, train), new_state


# ---------------------------------------------------------------- conv / TCN


def conv2d_init(key: jax.Array, c_in: int, c_out: int, kh: int, kw: int,
                bias: bool = True) -> Params:
    """2-D conv weights (OIHW), torch Conv2d default init
    (U(-1/sqrt(fan_in), 1/sqrt(fan_in)), fan_in = c_in*kh*kw)."""
    kw_, kb = jax.random.split(key)
    fan_in = c_in * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw_, (c_out, c_in, kh, kw), jnp.float32,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound)
    return p


def conv2d(p: Params, x: jnp.ndarray, stride: tuple[int, int] = (1, 1),
           padding: tuple[int, int] = (0, 0),
           dilation: tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """NCHW conv."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None, None]
    return y


def batch_norm_2d(p: Params, state: Params, x: jnp.ndarray, train: bool,
                  momentum: float = 0.1, eps: float = 1e-5
                  ) -> tuple[jnp.ndarray, Params]:
    """Per-channel BN on NCHW (torch BatchNorm2d semantics)."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 2, 3))
        var = jnp.mean(jnp.square(xf - mean[None, :, None, None]), axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean[None, :, None, None]) * jax.lax.rsqrt(var[None, :, None, None] + eps)
    y = y * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]
    return y.astype(x.dtype), new_state


def _bn_init(c: int) -> tuple[Params, Params]:
    return ({"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
            {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)})


def multi_scale_tcn_init(key: jax.Array, c_in: int, c_out: int,
                         kernel_size: int = 5, dilations: tuple[int, ...] = (1, 2)
                         ) -> tuple[Params, Params]:
    """Multi-branch dilated temporal conv mixer
    (≙ `model/modules/tcn.py:25-86`): len(dilations) dilated-conv branches +
    a maxpool branch + a 1x1 branch, channels split evenly; identity
    residual (c_in == c_out, stride 1 here)."""
    n_branches = len(dilations) + 2
    assert c_out % n_branches == 0
    bc = c_out // n_branches
    params: Params = {"branches": []}
    state: Params = {"branches": []}
    keys = jax.random.split(key, n_branches * 2)
    ki = 0
    for d in dilations:
        bn1p, bn1s = _bn_init(bc)
        bn2p, bn2s = _bn_init(bc)
        params["branches"].append({
            "conv1": conv2d_init(keys[ki], c_in, bc, 1, 1),
            "bn1": bn1p,
            "tconv": conv2d_init(keys[ki + 1], bc, bc, kernel_size, 1),
            "bn2": bn2p,
        })
        state["branches"].append({"bn1": bn1s, "bn2": bn2s})
        ki += 2
    # maxpool branch
    bn1p, bn1s = _bn_init(bc)
    bn2p, bn2s = _bn_init(bc)
    params["branches"].append({
        "conv1": conv2d_init(keys[ki], c_in, bc, 1, 1),
        "bn1": bn1p, "bn2": bn2p,
    })
    state["branches"].append({"bn1": bn1s, "bn2": bn2s})
    ki += 1
    # 1x1 branch
    bn1p, bn1s = _bn_init(bc)
    params["branches"].append({
        "conv1": conv2d_init(keys[ki], c_in, bc, 1, 1),
        "bn1": bn1p,
    })
    state["branches"].append({"bn1": bn1s})
    return params, state


def multi_scale_tcn(p: Params, state: Params, x: jnp.ndarray, train: bool,
                    kernel_size: int = 5, dilations: tuple[int, ...] = (1, 2)
                    ) -> tuple[jnp.ndarray, Params]:
    """x: [B,T,J,C] -> [B,T,J,C]."""
    xc = x.transpose(0, 3, 1, 2)  # NCHW = (B, C, T, J)
    outs = []
    new_states = []
    for i, d in enumerate(dilations):
        bp, bs = p["branches"][i], state["branches"][i]
        h = conv2d(bp["conv1"], xc)
        h, ns1 = batch_norm_2d(bp["bn1"], bs["bn1"], h, train)
        h = jax.nn.relu(h)
        pad = (kernel_size + (kernel_size - 1) * (d - 1) - 1) // 2
        h = conv2d(bp["tconv"], h, padding=(pad, 0), dilation=(d, 1))
        h, ns2 = batch_norm_2d(bp["bn2"], bs["bn2"], h, train)
        outs.append(h)
        new_states.append({"bn1": ns1, "bn2": ns2})
    i = len(dilations)
    bp, bs = p["branches"][i], state["branches"][i]
    h = conv2d(bp["conv1"], xc)
    h, ns1 = batch_norm_2d(bp["bn1"], bs["bn1"], h, train)
    h = jax.nn.relu(h)
    h = -jax.lax.reduce_window(  # MaxPool2d (3,1), stride 1, pad (1,0)
        -h, jnp.inf, jax.lax.min, (1, 1, 3, 1), (1, 1, 1, 1),
        [(0, 0), (0, 0), (1, 1), (0, 0)])
    h, ns2 = batch_norm_2d(bp["bn2"], bs["bn2"], h, train)
    outs.append(h)
    new_states.append({"bn1": ns1, "bn2": ns2})
    bp, bs = p["branches"][i + 1], state["branches"][i + 1]
    h = conv2d(bp["conv1"], xc)
    h, ns1 = batch_norm_2d(bp["bn1"], bs["bn1"], h, train)
    outs.append(h)
    new_states.append({"bn1": ns1})
    out = jnp.concatenate(outs, axis=1) + xc  # identity residual
    return out.transpose(0, 2, 3, 1), {"branches": new_states}


def adaptive_fusion_init(dim: int, n_branches: int = 3) -> Params:
    """Fusion gate Linear(n*dim -> n), weight zeros / bias 1/n
    (≙ `model/KASportsFormer.py:184-186`)."""
    return {
        "w": jnp.zeros((n_branches * dim, n_branches), jnp.float32),
        "b": jnp.full((n_branches,), 1.0 / n_branches, jnp.float32),
    }


def adaptive_fusion(p: Params, branches: list[jnp.ndarray]) -> jnp.ndarray:
    """Softmax-gated convex combination of branch streams
    (≙ `model/KASportsFormer.py:278-284`)."""
    alpha = jax.nn.softmax(linear(p, jnp.concatenate(branches, axis=-1)), axis=-1)
    out = branches[0] * alpha[..., 0:1]
    for i, br in enumerate(branches[1:], start=1):
        out = out + br * alpha[..., i : i + 1]
    return out
