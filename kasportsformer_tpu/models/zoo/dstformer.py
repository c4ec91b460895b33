"""DSTFormer (MotionBERT backbone) — dual-stream ST/TS blocks fused by a
per-depth gate (`model/DSTFormer.py:278-371`).

Tokens live as (B*F, J, C); each depth runs a spatial-first block and a
temporal-first block on the SAME input and fuses them with a softmax gate
(`ts_attn`, zero-weight / 0.5-bias init). Temporal attention reshapes to
attend over frames per joint. Init follows the reference's trunc_normal(.02)
for all linear weights with zero bias (`DSTFormer.py:323-330`), and
trunc-normal positional/temporal embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.models import layers as L
from kasportsformer_tpu.models.registry import register_model

Params = dict[str, Any]


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _lin_tn(key, dim_in, dim_out, bias=True) -> Params:
    kw, _ = jax.random.split(key)
    p = {"w": _trunc_normal(kw, (dim_in, dim_out))}
    if bias:
        p["b"] = jnp.zeros((dim_out,), jnp.float32)
    return p


@dataclasses.dataclass(frozen=True)
class DSTFormerConfig:
    dim_in: int = 3
    dim_out: int = 3
    dim_feat: int = 256
    dim_rep: int = 512
    depth: int = 5
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_joints: int = 17
    maxlen: int = 243
    qkv_bias: bool = True
    qk_scale: float | None = None
    att_fuse: bool = True
    drop_path_rate: float = 0.0


def _attn_temporal(p: Params, x: jnp.ndarray, seqlen: int, num_heads: int,
                   qk_scale: float | None) -> jnp.ndarray:
    """Temporal MHSA on (B*F, J, C) tokens: attend over F per joint
    (`DSTFormer.py:189-201`), through the shared masked-contraction core
    (Pallas on TPU)."""
    bf, j, c = x.shape
    b = bf // seqlen
    scale = qk_scale or (c // num_heads) ** -0.5
    qkv = L.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def grouped(z):  # (B*F, J, C) -> (B, J, F, C)
        return z.reshape(b, seqlen, j, c).transpose(0, 2, 1, 3)

    out = L._sdpa_tokens(grouped(q), grouped(k), grouped(v), scale, num_heads)
    out = out.transpose(0, 2, 1, 3).reshape(bf, j, c)
    return L.linear(p["proj"], out)


def _attn_spatial(p: Params, x: jnp.ndarray, num_heads: int,
                  qk_scale: float | None) -> jnp.ndarray:
    return L.attention_tokens(p, x, num_heads, qk_scale)


def _drop_path(branch: jnp.ndarray, rate: float, key) -> jnp.ndarray:
    """Stochastic depth on the residual branch, timm semantics: per leading
    (B*F or B*J) row, rescaled by keep prob (≙ `DSTFormer.py:234,249-256` —
    the reference samples independently per residual)."""
    if rate > 0.0 and key is not None:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, (branch.shape[0], 1, 1))
        branch = branch * mask.astype(branch.dtype) / keep
    return branch


def _half_block(p: Params, x: jnp.ndarray, which: str, seqlen: int,
                num_heads: int, qk_scale, rate: float = 0.0,
                key=None) -> jnp.ndarray:
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    if which == "s":
        x = x + _drop_path(
            _attn_spatial(p["attn_s"], L.layer_norm(p["norm1_s"], x),
                          num_heads, qk_scale), rate, k1)
        x = L.mlp_ln_residual(p["norm2_s"], p["mlp_s"], x,
                              drop_path_rate=rate, key=k2)
    else:
        x = x + _drop_path(
            _attn_temporal(p["attn_t"], L.layer_norm(p["norm1_t"], x),
                           seqlen, num_heads, qk_scale), rate, k1)
        x = L.mlp_ln_residual(p["norm2_t"], p["mlp_t"], x,
                              drop_path_rate=rate, key=k2)
    return x


class DSTFormer:
    def __init__(self, cfg: DSTFormerConfig | None = None, compute_dtype=jnp.float32):
        self.cfg = cfg or DSTFormerConfig()
        self.compute_dtype = compute_dtype

    def _block_init(self, key) -> Params:
        cfg = self.cfg
        dim, hidden = cfg.dim_feat, int(cfg.dim_feat * cfg.mlp_ratio)
        keys = jax.random.split(key, 6)
        return {
            "norm1_s": L.layer_norm_init(dim), "norm1_t": L.layer_norm_init(dim),
            "norm2_s": L.layer_norm_init(dim), "norm2_t": L.layer_norm_init(dim),
            "attn_s": {"qkv": _lin_tn(keys[0], dim, dim * 3, cfg.qkv_bias),
                       "proj": _lin_tn(keys[1], dim, dim)},
            "attn_t": {"qkv": _lin_tn(keys[2], dim, dim * 3, cfg.qkv_bias),
                       "proj": _lin_tn(keys[3], dim, dim)},
            "mlp_s": {"fc1": _lin_tn(keys[4], dim, hidden),
                      "fc2": _lin_tn(jax.random.fold_in(keys[4], 1), hidden, dim)},
            "mlp_t": {"fc1": _lin_tn(keys[5], dim, hidden),
                      "fc2": _lin_tn(jax.random.fold_in(keys[5], 1), hidden, dim)},
        }

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        params: Params = {
            "joints_embed": _lin_tn(keys[0], cfg.dim_in, cfg.dim_feat),
            "pos_embed": _trunc_normal(keys[1], (1, cfg.num_joints, cfg.dim_feat)),
            "temp_embed": _trunc_normal(keys[2], (1, cfg.maxlen, 1, cfg.dim_feat)),
            "norm": L.layer_norm_init(cfg.dim_feat),
            "pre_logits": _lin_tn(keys[3], cfg.dim_feat, cfg.dim_rep),
            "head": _lin_tn(keys[4], cfg.dim_rep, cfg.dim_out),
        }
        blocks_st = [self._block_init(k)
                     for k in jax.random.split(keys[5], cfg.depth)]
        blocks_ts = [self._block_init(k)
                     for k in jax.random.split(keys[6], cfg.depth)]
        params["blocks_st"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks_st)
        params["blocks_ts"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks_ts)
        if cfg.att_fuse:
            params["ts_attn"] = {
                "w": jnp.zeros((cfg.depth, cfg.dim_feat * 2, 2), jnp.float32),
                "b": jnp.full((cfg.depth, 2), 0.5, jnp.float32),
            }
        return params, {}

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False, return_rep: bool = False,
              key: jax.Array | None = None) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        use_dp = train and key is not None and cfg.drop_path_rate > 0
        dpr = [float(r) for r in np.linspace(0, cfg.drop_path_rate, cfg.depth)]
        x = x.astype(self.compute_dtype)
        b, f, j, _ = x.shape
        tokens = L.linear(params["joints_embed"], x.reshape(b * f, j, -1))
        tokens = tokens + params["pos_embed"].astype(tokens.dtype)
        tokens = (tokens.reshape(b, f, j, -1)
                  + params["temp_embed"][:, :f].astype(tokens.dtype))
        tokens = tokens.reshape(b * f, j, -1)

        def depth_step(carry, st_p, ts_p, fuse, rate, keys4):
            x_st = _half_block(st_p, carry, "s", f, cfg.num_heads,
                               cfg.qk_scale, rate, keys4[0])
            x_st = _half_block(st_p, x_st, "t", f, cfg.num_heads,
                               cfg.qk_scale, rate, keys4[1])
            x_ts = _half_block(ts_p, carry, "t", f, cfg.num_heads,
                               cfg.qk_scale, rate, keys4[2])
            x_ts = _half_block(ts_p, x_ts, "s", f, cfg.num_heads,
                               cfg.qk_scale, rate, keys4[3])
            if cfg.att_fuse:
                fuse_w, fuse_b = fuse
                alpha = jnp.concatenate([x_st, x_ts], axis=-1)
                alpha = alpha @ fuse_w.astype(alpha.dtype) + fuse_b.astype(alpha.dtype)
                alpha = jax.nn.softmax(alpha.astype(jnp.float32), -1).astype(carry.dtype)
                return x_st * alpha[..., 0:1] + x_ts * alpha[..., 1:2]
            return (x_st + x_ts) * 0.5

        if use_dp:
            # per-depth drop-path rates differ -> unrolled loop in train
            depth_keys = jax.random.split(key, cfg.depth * 4)
            for i in range(cfg.depth):
                st_p = jax.tree.map(lambda t: t[i], params["blocks_st"])
                ts_p = jax.tree.map(lambda t: t[i], params["blocks_ts"])
                fuse = ((params["ts_attn"]["w"][i], params["ts_attn"]["b"][i])
                        if cfg.att_fuse else None)
                tokens = depth_step(tokens, st_p, ts_p, fuse, dpr[i],
                                    [depth_keys[i * 4 + j] for j in range(4)])
        else:
            def body(carry, step):
                if cfg.att_fuse:
                    st_p, ts_p, fuse_w, fuse_b = step
                    fuse = (fuse_w, fuse_b)
                else:
                    st_p, ts_p = step
                    fuse = None
                out = depth_step(carry, st_p, ts_p, fuse, 0.0, [None] * 4)
                return out, None

            xs = ((params["blocks_st"], params["blocks_ts"],
                   params["ts_attn"]["w"], params["ts_attn"]["b"])
                  if cfg.att_fuse else (params["blocks_st"], params["blocks_ts"]))
            tokens, _ = jax.lax.scan(body, tokens, xs)

        tokens = L.layer_norm(params["norm"], tokens)
        out = tokens.reshape(b, f, j, -1)
        out = jnp.tanh(L.linear(params["pre_logits"], out))
        if return_rep:
            return out, state
        y = L.linear(params["head"], out)
        return y.astype(jnp.float32), state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("DSTFormer")
def _build(config):
    cfg = DSTFormerConfig(
        dim_in=config.dim_in, dim_out=config.dim_out, dim_feat=config.dim_feat,
        dim_rep=config.dim_rep, depth=config.n_layers,
        num_heads=config.num_heads, mlp_ratio=float(config.mlp_ratio),
        num_joints=config.num_joints, qkv_bias=True, qk_scale=config.qkv_scale,
        drop_path_rate=config.drop_path)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return DSTFormer(cfg, compute_dtype=dtype)
