"""MixSTE legacy variants — the reference file's dead-but-present classes.

The reference's `model/MixSTE.py` ships three classes and one module that no
entry point wires (verified: only `MixSTE2` is constructible through
`model_tools.load_model`): `ProbAttention` (Informer-style prob-sparse
attention, `model/MixSTE.py:173-297`), `MixSTE_seperate` (`:570-741`),
`MixSTEPooling` (channel-halving hourglass, `:1084-1287`) and `attn_pooling`
(grouped strided conv downsampler, `:390-402`). They are part of the
reference's API surface, so they exist here too — faithful math, functional
JAX, no perf work (they are not on any hot path).

Quirks preserved on purpose:
* `MixSTE_seperate.ST_foward` applies TTE block 0 TWICE (once inside
  `TTE_foward`, then again by its `range(0, depth)` loop — `:700-706`).
* `ProbAttention` with `mix=True` reshapes the (B, H, L, D) context buffer
  directly to (B, N, H*D) — scrambling head/token lanes exactly like the
  reference's `.contiguous().reshape` chain (`:283-288`).
* `MixSTEPooling`'s channel schedule: dims halve via each temporal block's
  `reduction` conv for the first half of the depth and double via `improve`
  for the second half (`Block.forward`, `:335-344`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.models import layers as L
from kasportsformer_tpu.models.registry import register_model

Params = dict[str, Any]
_EPS = 1e-6


# ------------------------------------------------------------ ProbAttention


def prob_attention_init(key: jax.Array, dim: int, qkv_bias: bool = False
                        ) -> Params:
    """Separate q/k/v projections + output proj (`model/MixSTE.py:187-192`)."""
    kq, kk, kv, kp = jax.random.split(key, 4)
    return {
        "query": L.linear_init(kq, dim, dim),
        "key": L.linear_init(kk, dim, dim),
        "value": L.linear_init(kv, dim, dim),
        "proj": L.linear_init(kp, dim, dim),
    }


def prob_attention(p: Params, x: jnp.ndarray, num_heads: int,
                   factor: int = 5, qk_scale: float | None = None,
                   mask_flag: bool = False, mix: bool = True,
                   key: jax.Array | None = None,
                   index_sample: jnp.ndarray | None = None) -> jnp.ndarray:
    """Informer prob-sparse self-attention on (B, N, C) tokens
    (`model/MixSTE.py:248-297`).

    Shapes are static: U_part/u are Python ints from the token count, so the
    top-u query selection jits cleanly. The reference samples its key subset
    with the global torch RNG at every forward; here callers MUST thread a
    fresh `key` per call (or pin `index_sample`, as the parity tests do) —
    a silent fixed-key default would reuse identical sample indices every
    forward, unlike the reference.
    """
    if key is None and index_sample is None:
        raise ValueError(
            "prob_attention needs `key` (fresh per forward) or an explicit "
            "`index_sample`; the reference redraws from the global RNG each "
            "call (`model/MixSTE.py:266`)")
    b, n, c = x.shape
    h = num_heads
    d = c // h

    def heads(z):  # (B, N, C) -> (B, H, N, D)
        return z.reshape(b, n, h, d).transpose(0, 2, 1, 3)

    q = heads(L.linear(p["query"], x))
    k = heads(L.linear(p["key"], x))
    v = heads(L.linear(p["value"], x))
    l_q = l_k = n

    # U_part = c*ln(L_k), u = c*ln(L_q), both clamped (`:265-270`)
    u_part = min(int(factor * math.ceil(math.log(l_k))), l_k)
    u = min(int(factor * math.ceil(math.log(l_q))), l_q)

    if index_sample is None:
        index_sample = jax.random.randint(key, (l_q, u_part), 0, l_k)

    # sampled scores -> sparsity measure M -> top-u queries (`_prob_QK`)
    k_sample = k[:, :, index_sample, :]  # (B, H, L_Q, U_part, D)
    qk_sample = jnp.einsum("bhld,bhlud->bhlu", q, k_sample)
    m = qk_sample.max(axis=-1) - qk_sample.sum(axis=-1) / l_k  # (B, H, L_Q)
    _, m_top = jax.lax.top_k(m, u)  # (B, H, u)

    q_reduce = jnp.take_along_axis(q, m_top[..., None], axis=2)  # (B, H, u, D)
    scores = jnp.einsum("bhud,bhkd->bhuk", q_reduce, k)  # (B, H, u, L_K)
    scale = qk_scale if qk_scale is not None else d ** -0.5
    scores = scores * scale

    if mask_flag:
        # ProbMask (`:159-170`): causal upper-triangular rows gathered at the
        # selected query indices; cumsum initial context (`:222-226`)
        tri = jnp.triu(jnp.ones((l_q, l_k), bool), 1)
        indicator = tri[m_top]  # (B, H, u, L_K)
        scores = jnp.where(indicator, -jnp.inf, scores)
        context = jnp.cumsum(v, axis=2)
    else:
        context = jnp.broadcast_to(v.mean(axis=2, keepdims=True),
                                   (b, h, l_q, d))

    attn = jax.nn.softmax(scores, axis=-1)
    update = jnp.einsum("bhuk,bhkd->bhud", attn, v)
    bidx = jnp.arange(b)[:, None, None]
    hidx = jnp.arange(h)[None, :, None]
    context = context.at[bidx, hidx, m_top].set(update)

    if mix:
        # reference reshapes the (B, H, L, D) buffer straight to (B, N, H*D)
        out = context.reshape(b, n, h * d)
    else:
        out = context.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    return L.linear(p["proj"], out)


# ------------------------------------------------------------ attn_pooling


def attn_pooling_init(key: jax.Array, in_feature: int, out_feature: int,
                      stride: int = 2) -> Params:
    """Grouped strided Conv1d downsampler + (unused) fc
    (`model/MixSTE.py:390-402`). Conv weight layout (out, in/groups, K)."""
    kc, kf = jax.random.split(key)
    ksize = stride + 1
    fan_in = ksize  # in_channels/groups * kernel = 1 * ksize
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "conv": {
            "w": jax.random.uniform(kc, (out_feature, 1, ksize),
                                    jnp.float32, -bound, bound),
            "b": jax.random.uniform(jax.random.fold_in(kc, 1),
                                    (out_feature,), jnp.float32,
                                    -bound, bound),
        },
        # dead in the reference forward but present in its parameters
        "fc": L.linear_init(kf, in_feature, out_feature),
    }


def attn_pooling(p: Params, x: jnp.ndarray, in_feature: int,
                 stride: int = 2) -> jnp.ndarray:
    """x: (B, C_in, T) -> (B, C_out, T//stride), groups=C_in like the
    reference's Conv1d(groups=in_feature)."""
    return jax.lax.conv_general_dilated(
        x, p["conv"]["w"], window_strides=(stride,),
        padding=[(stride // 2, stride // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=in_feature,
    ) + p["conv"]["b"][None, :, None]


# ------------------------------------------------------------ shared bits


def _block_apply(p: Params, tokens: jnp.ndarray, num_heads: int,
                 qk_scale, rate: float, subkey) -> jnp.ndarray:
    return L.transformer_block(p, tokens, num_heads, qk_scale, _EPS,
                               drop_path_rate=rate, key=subkey)


def _changedim(p: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    """Optional post-block channel resize (`Block.forward`, `:335-344`):
    a 1x1 Conv1d over 'b c t' == a linear over the channel axis."""
    if "reduction" in p:
        return L.linear(p["reduction"], tokens)
    if "improve" in p:
        return L.linear(p["improve"], tokens)
    return tokens


# ------------------------------------------------------------ MixSTE_seperate


@dataclasses.dataclass(frozen=True)
class MixSTESeperateConfig:
    num_frame: int = 9
    num_joints: int = 17
    in_chans: int = 2
    embed_dim: int = 32  # embed_dim_ratio
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.2
    dim_out: int = 3


class MixSTESeperate:
    """`MixSTE_seperate` (`model/MixSTE.py:570-741`): all spatial blocks
    first, then all temporal blocks — with the reference's double-apply of
    temporal block 0 preserved."""

    def __init__(self, cfg: MixSTESeperateConfig | None = None,
                 compute_dtype=jnp.float32):
        self.cfg = cfg or MixSTESeperateConfig()
        self.compute_dtype = compute_dtype
        d = self.cfg.depth
        self.dpr = [float(r) for r in
                    np.linspace(0, self.cfg.drop_path_rate, d)]

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        dim = cfg.embed_dim
        keys = jax.random.split(key, 4 + 2 * cfg.depth)
        params: Params = {
            "spatial_embed": L.linear_init(keys[0], cfg.in_chans, dim),
            "spatial_pos_embed": jnp.zeros((1, cfg.num_joints, dim)),
            "temporal_pos_embed": jnp.zeros((1, cfg.num_frame, dim)),
            "spatial_norm": L.layer_norm_init(dim),
            "temporal_norm": L.layer_norm_init(dim),
            "head_norm": L.layer_norm_init(dim),
            "head": L.linear_init(keys[1], dim, cfg.dim_out),
            "ste": [L.transformer_block_init(keys[4 + i], dim, cfg.mlp_ratio,
                                             cfg.qkv_bias)
                    for i in range(cfg.depth)],
            "tte": [L.transformer_block_init(keys[4 + cfg.depth + i], dim,
                                             cfg.mlp_ratio, cfg.qkv_bias)
                    for i in range(cfg.depth)],
        }
        return params, {}

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False, key: jax.Array | None = None
              ) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x[..., : cfg.in_chans].astype(self.compute_dtype)
        b, f, n, _ = x.shape
        use_dp = train and key is not None and cfg.drop_path_rate > 0
        nkeys = 2 * cfg.depth + 1
        keys = (list(jax.random.split(key, nkeys)) if use_dp
                else [None] * nkeys)

        def rate(i):
            return self.dpr[i] if use_dp else 0.0

        # STE_forward: embed + pos + spatial block 0 (`:667-682`)
        tokens = x.reshape(b * f, n, -1)
        tokens = L.linear(params["spatial_embed"], tokens)
        tokens = tokens + params["spatial_pos_embed"].astype(tokens.dtype)
        tokens = _block_apply(params["ste"][0], tokens, cfg.num_heads,
                              cfg.qk_scale, rate(0), keys[0])
        tokens = L.layer_norm(params["spatial_norm"], tokens, _EPS)

        # ST_foward first half: remaining spatial blocks (`:698-709`)
        for i in range(1, cfg.depth):
            tokens = _block_apply(params["ste"][i], tokens, cfg.num_heads,
                                  cfg.qk_scale, rate(i), keys[i])
            tokens = L.layer_norm(params["spatial_norm"], tokens, _EPS)

        # temporal stream on (b n) f cw
        tokens = (tokens.reshape(b, f, n, -1).transpose(0, 2, 1, 3)
                  .reshape(b * n, f, -1))
        # TTE_foward: pos + block 0 (`:684-696`)
        tokens = tokens + params["temporal_pos_embed"].astype(tokens.dtype)
        tokens = _block_apply(params["tte"][0], tokens, cfg.num_heads,
                              cfg.qk_scale, rate(0), keys[cfg.depth])
        tokens = L.layer_norm(params["temporal_norm"], tokens, _EPS)
        # then the loop re-applies block 0 before blocks 1.. (`:713-721`)
        for i in range(cfg.depth):
            tokens = _block_apply(params["tte"][i], tokens, cfg.num_heads,
                                  cfg.qk_scale, rate(i), keys[cfg.depth + 1 + i])
            tokens = L.layer_norm(params["temporal_norm"], tokens, _EPS)

        out = tokens.reshape(b, n, f, -1).transpose(0, 2, 1, 3)
        out = L.layer_norm(params["head_norm"], out, eps=1e-5)
        out = L.linear(params["head"], out)
        return out.astype(jnp.float32), state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ------------------------------------------------------------ MixSTEPooling


@dataclasses.dataclass(frozen=True)
class MixSTEPoolingConfig:
    num_frame: int = 9
    num_joints: int = 17
    in_chans: int = 2
    embed_dim: int = 32  # embed_dim_ratio
    depth: int = 4
    num_heads: int = 4
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.2
    dim_out: int = 3


def _pooling_dims(embed_dim: int, depth: int) -> tuple[list, list, list]:
    """Per-block input dims + per-i norm dims (`model/MixSTE.py:1128-1183`)."""
    midep = depth // 2
    block_dims = [embed_dim // 2 ** i for i in range(midep)]
    block_dims += [embed_dim // 2 ** (depth - i - 1) for i in range(midep, depth)]
    snorm_dims = list(block_dims)
    tnorm_dims = [embed_dim // 2 ** (i + 1) for i in range(midep - 1)]
    tnorm_dims += [embed_dim // 2 ** (depth - i - 2)
                   for i in range(midep - 1, depth - 1)]
    tnorm_dims += [embed_dim]
    return block_dims, snorm_dims, tnorm_dims


class MixSTEPooling:
    """`MixSTEPooling` (`model/MixSTE.py:1084-1287`): hourglass channel
    schedule — each temporal block's trailing 1x1 conv halves the channel dim
    for the first half of the depth and doubles it back for the second."""

    def __init__(self, cfg: MixSTEPoolingConfig | None = None,
                 compute_dtype=jnp.float32):
        self.cfg = cfg or MixSTEPoolingConfig()
        self.compute_dtype = compute_dtype
        d = self.cfg.depth
        self.dpr = [float(r) for r in
                    np.linspace(0, self.cfg.drop_path_rate, d)]
        self.block_dims, self.snorm_dims, self.tnorm_dims = _pooling_dims(
            self.cfg.embed_dim, d)

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        dim = cfg.embed_dim
        keys = jax.random.split(key, 4 + 3 * cfg.depth)
        ste, tte = [], []
        for i in range(cfg.depth):
            bd = self.block_dims[i]
            ste.append(L.transformer_block_init(keys[4 + i], bd,
                                                cfg.mlp_ratio, cfg.qkv_bias))
            blk = L.transformer_block_init(keys[4 + cfg.depth + i], bd,
                                           cfg.mlp_ratio, cfg.qkv_bias)
            # changedim resize conv (currentdim = i+1, `:1146-1160`)
            cd = i + 1
            rk = keys[4 + 2 * cfg.depth + i]
            if cd < cfg.depth // 2:
                blk["reduction"] = L.linear_init(rk, bd, bd // 2)
            elif cfg.depth > cd > cfg.depth // 2:
                blk["improve"] = L.linear_init(rk, bd, bd * 2)
            tte.append(blk)
        params: Params = {
            "spatial_embed": L.linear_init(keys[0], cfg.in_chans, dim),
            "spatial_pos_embed": jnp.zeros((1, cfg.num_joints, dim)),
            "temporal_pos_embed": jnp.zeros((1, cfg.num_frame, dim)),
            "spatial_norms": [L.layer_norm_init(d_) for d_ in self.snorm_dims],
            "temporal_norms": [L.layer_norm_init(d_) for d_ in self.tnorm_dims],
            "head_norm": L.layer_norm_init(dim),
            "head": L.linear_init(keys[1], dim, cfg.dim_out),
            "ste": ste,
            "tte": tte,
        }
        return params, {}

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False, key: jax.Array | None = None
              ) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x[..., : cfg.in_chans].astype(self.compute_dtype)
        b, f, n, _ = x.shape
        use_dp = train and key is not None and cfg.drop_path_rate > 0
        keys = (list(jax.random.split(key, 2 * cfg.depth)) if use_dp
                else [None] * (2 * cfg.depth))

        def rate(i):
            return self.dpr[i] if use_dp else 0.0

        # STE_forward (`:1199-1214`)
        tokens = x.reshape(b * f, n, -1)
        tokens = L.linear(params["spatial_embed"], tokens)
        tokens = tokens + params["spatial_pos_embed"].astype(tokens.dtype)
        tokens = _block_apply(params["ste"][0], tokens, cfg.num_heads,
                              cfg.qk_scale, rate(0), keys[0])
        tokens = L.layer_norm(params["spatial_norms"][0], tokens, _EPS)
        tokens = (tokens.reshape(b, f, n, -1).transpose(0, 2, 1, 3)
                  .reshape(b * n, f, -1))

        # TTE_foward (`:1216-1227`): temporal block 0 reduces channels
        tokens = tokens + params["temporal_pos_embed"].astype(tokens.dtype)
        tokens = _block_apply(params["tte"][0], tokens, cfg.num_heads,
                              cfg.qk_scale, rate(0), keys[1])
        tokens = _changedim(params["tte"][0], tokens)
        tokens = L.layer_norm(params["temporal_norms"][0], tokens, _EPS)

        # ST_foward (`:1229-1256`)
        x4 = tokens.reshape(b, n, f, -1).transpose(0, 2, 1, 3)
        for i in range(1, cfg.depth):
            h = x4.reshape(b * f, n, -1)
            h = _block_apply(params["ste"][i], h, cfg.num_heads,
                             cfg.qk_scale, rate(i), keys[2 * i])
            h = L.layer_norm(params["spatial_norms"][i], h, _EPS)
            h = (h.reshape(b, f, n, -1).transpose(0, 2, 1, 3)
                 .reshape(b * n, f, -1))
            h = _block_apply(params["tte"][i], h, cfg.num_heads,
                             cfg.qk_scale, rate(i), keys[2 * i + 1])
            h = _changedim(params["tte"][i], h)
            h = L.layer_norm(params["temporal_norms"][i], h, _EPS)
            x4 = h.reshape(b, n, f, -1).transpose(0, 2, 1, 3)

        out = L.layer_norm(params["head_norm"], x4, eps=1e-5)
        out = L.linear(params["head"], out)
        return out.astype(jnp.float32), state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("MixSTE_seperate")
def _build_seperate(config):
    cfg = MixSTESeperateConfig(
        num_frame=config.n_frames, num_joints=config.num_joints,
        in_chans=config.dim_in if config.dim_in in (2, 3) else 2,
        embed_dim=config.dim_feat, depth=config.n_layers,
        num_heads=config.num_heads, mlp_ratio=float(config.mlp_ratio),
        qkv_bias=True, qk_scale=config.qkv_scale,
        drop_path_rate=config.drop_path)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return MixSTESeperate(cfg, compute_dtype=dtype)


@register_model("MixSTEPooling")
def _build_pooling(config):
    cfg = MixSTEPoolingConfig(
        num_frame=config.n_frames, num_joints=config.num_joints,
        in_chans=config.dim_in if config.dim_in in (2, 3) else 2,
        embed_dim=config.dim_feat, depth=config.n_layers,
        num_heads=config.num_heads, mlp_ratio=float(config.mlp_ratio),
        qkv_bias=True, qk_scale=config.qkv_scale,
        drop_path_rate=config.drop_path)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return MixSTEPooling(cfg, compute_dtype=dtype)
