"""MixSTE — alternating seq-to-seq spatial/temporal transformer
(`model/MixSTE.py:405-567`, class MixSTE2, the live code path; the file's
commented-out Linformer/prob-sparse variants are legacy).

Flow (reference `STE_forward`/`TTE_foward`/`ST_foward`):
  spatial block 0 over joints per frame -> Spatial_norm -> temporal block 0
  over frames per joint (+ temporal pos embed) -> Temporal_norm -> then
  (depth-1) alternating spatial/temporal blocks, each followed by the SAME
  shared Spatial_norm / Temporal_norm -> LayerNorm+Linear head.

TPU design: block 0 of each stream is applied explicitly; blocks 1..D-1 run
under `lax.scan` over stacked params. LN eps is 1e-6 (reference
`partial(nn.LayerNorm, eps=1e-6)`), qkv bias on by default. Stochastic depth
(default 0.2, linearly scaled per depth) is implemented for training; eval is
deterministic.
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
_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class MixSTEConfig:
    num_frame: int = 27
    num_joints: int = 17
    in_chans: int = 2
    embed_dim: int = 512  # embed_dim_ratio
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.2
    dim_out: int = 3


class MixSTE:
    def __init__(self, cfg: MixSTEConfig | None = None, compute_dtype=jnp.float32):
        self.cfg = cfg or MixSTEConfig()
        self.compute_dtype = compute_dtype
        d = self.cfg.depth
        self.dpr = [float(r) for r in np.linspace(0, self.cfg.drop_path_rate, d)]

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        keys = jax.random.split(key, 4 + 2 * cfg.depth)
        dim = cfg.embed_dim
        params: Params = {
            "spatial_embed": L.linear_init(keys[0], cfg.in_chans, dim),
            "spatial_pos_embed": jnp.zeros((1, cfg.num_joints, dim), jnp.float32),
            "temporal_pos_embed": jnp.zeros((1, cfg.num_frame, dim), jnp.float32),
            "spatial_norm": L.layer_norm_init(dim),
            "temporal_norm": L.layer_norm_init(dim),
            "head_norm": L.layer_norm_init(dim),
            "head": L.linear_init(keys[1], dim, cfg.dim_out),
        }
        ste = [L.transformer_block_init(keys[4 + i], dim, cfg.mlp_ratio, cfg.qkv_bias)
               for i in range(cfg.depth)]
        tte = [L.transformer_block_init(keys[4 + cfg.depth + i], dim,
                                        cfg.mlp_ratio, cfg.qkv_bias)
               for i in range(cfg.depth)]
        params["ste0"], params["tte0"] = ste[0], tte[0]
        if cfg.depth > 1:
            params["ste_rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *ste[1:])
            params["tte_rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *tte[1:])
        return params, {}

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False, key: jax.Array | None = None
              ) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x[..., : cfg.in_chans].astype(self.compute_dtype)
        b, f, n, _ = x.shape
        heads, scale = cfg.num_heads, cfg.qk_scale
        use_dp = train and key is not None and cfg.drop_path_rate > 0

        def block(p, tokens, rate, subkey):
            return L.transformer_block(
                p, tokens, heads, scale, _EPS,
                drop_path_rate=rate if use_dp else 0.0, key=subkey)

        keys = (jax.random.split(key, 2 * cfg.depth) if use_dp
                else [None] * (2 * cfg.depth))

        # STE_forward: spatial block 0 over joints, per frame
        tokens = x.reshape(b * f, n, -1)
        tokens = L.linear(params["spatial_embed"], tokens)
        tokens = tokens + params["spatial_pos_embed"].astype(tokens.dtype)
        tokens = block(params["ste0"], tokens, self.dpr[0], keys[0])
        tokens = L.layer_norm(params["spatial_norm"], tokens, _EPS)

        # TTE_foward: temporal block 0 over frames, per joint
        tokens = tokens.reshape(b, f, n, -1).transpose(0, 2, 1, 3).reshape(b * n, f, -1)
        tokens = tokens + params["temporal_pos_embed"].astype(tokens.dtype)
        tokens = block(params["tte0"], tokens, self.dpr[0], keys[1])
        tokens = L.layer_norm(params["temporal_norm"], tokens, _EPS)

        # ST_foward: alternating blocks 1..depth-1 under scan
        x4 = tokens.reshape(b, n, f, -1).transpose(0, 2, 1, 3)  # (b, f, n, c)
        if cfg.depth > 1:
            def pair(carry, ste_p, tte_p, rate, ks, kt):
                h = carry.reshape(b * f, n, -1)
                h = block(ste_p, h, rate, ks)
                h = L.layer_norm(params["spatial_norm"], h, _EPS)
                h = h.reshape(b, f, n, -1).transpose(0, 2, 1, 3).reshape(b * n, f, -1)
                h = block(tte_p, h, rate, kt)
                h = L.layer_norm(params["temporal_norm"], h, _EPS)
                return h.reshape(b, n, f, -1).transpose(0, 2, 1, 3)

            if use_dp:
                # per-depth drop-path rates differ -> unrolled loop in train
                for i in range(cfg.depth - 1):
                    ste_p = jax.tree.map(lambda t: t[i], params["ste_rest"])
                    tte_p = jax.tree.map(lambda t: t[i], params["tte_rest"])
                    x4 = pair(x4, ste_p, tte_p, self.dpr[i + 1],
                              keys[2 * (i + 1)], keys[2 * (i + 1) + 1])
            else:
                x4, _ = jax.lax.scan(
                    lambda carry, step: (pair(carry, *step, 0.0, None, None), None),
                    x4, (params["ste_rest"], params["tte_rest"]))

        out = L.layer_norm(params["head_norm"], x4, eps=1e-5)
        out = L.linear(params["head"], out)
        return out.astype(jnp.float32), state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("MixSTE")
def _build(config):
    cfg = MixSTEConfig(
        num_frame=config.n_frames, num_joints=config.num_joints,
        in_chans=config.dim_in if config.dim_in in (2, 3) else 2,
        embed_dim=config.dim_feat, depth=config.n_layers,
        num_heads=config.num_heads, mlp_ratio=float(config.mlp_ratio),
        qkv_bias=True, qk_scale=config.qkv_scale,
        drop_path_rate=config.drop_path)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return MixSTE(cfg, compute_dtype=dtype)
