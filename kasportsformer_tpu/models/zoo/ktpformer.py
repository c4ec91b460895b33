"""KTPFormer — MixSTE trunk prefixed by kinematic/trajectory prior attention
(`model/KTPFormer.py`).

KPA lifts raw 2-channel joints through a learnable graph conv over the
skeleton adjacency (separate self/neighbor weights, per-node gains, a learned
global-topology offset) + BN + ReLU, adds a spatial pos-embed, then MHSA with
a residual from the post-embed stream. TPA is the temporal twin (two stacked
graph convs with residual over a frame-chain adjacency). The trunk is the
MixSTE alternating ST/TS stack with shared stream norms
(`KTPFormer.py:575-618`).

Adjacency priors reproduce `model/model_tools.py:46-75`: symmetric, row-
normalized, diagonal forced to 1.
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

H36M_PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15])


def adj_mx_from_edges(num_pts: int, edges: np.ndarray) -> np.ndarray:
    """Symmetric, row-normalized adjacency with unit diagonal
    (≙ `model/model_tools.py:46-62`)."""
    adj = np.zeros((num_pts, num_pts), np.float32)
    for i, j in edges:
        adj[i, j] = 1.0
    adj = np.maximum(adj, adj.T)  # symmetrize
    rowsum = adj.sum(1)
    rinv = np.where(rowsum > 0, 1.0 / np.maximum(rowsum, 1e-12), 0.0)
    adj = adj * rinv[:, None]  # row-normalize
    eye = np.eye(num_pts, dtype=np.float32)
    return adj * (1 - eye) + eye


def adj_mx_from_skeleton(num_joints: int = 17) -> np.ndarray:
    edges = [(i, p) for i, p in enumerate(H36M_PARENTS[:num_joints]) if p >= 0]
    return adj_mx_from_edges(num_joints, np.array(edges))


def adj_mx_from_skeleton_temporal(num_frames: int,
                                  parents: np.ndarray | None = None) -> np.ndarray:
    if parents is None:
        parents = np.arange(-1, num_frames - 1)  # frame chain
    edges = [(i, p) for i, p in enumerate(parents) if p >= 0]
    return adj_mx_from_edges(num_frames, np.array(edges))


# ------------------------------------------------------------ prior modules


def _lgc_init(key, dim_in: int, dim_out: int, n_nodes: int) -> Params:
    """LearnableGraphConv params (`KTPFormer.py:39-66`): W xavier-uniform
    (gain 1.414), M ones, adj2 const 1e-6, bias U(-1/sqrt(out), ...)."""
    kw, kb = jax.random.split(key)
    gain = 1.414
    bound_w = gain * math.sqrt(6.0 / (dim_in + dim_out))
    bound_b = 1.0 / math.sqrt(dim_out)
    return {
        "W": jax.random.uniform(kw, (2, dim_in, dim_out), jnp.float32,
                                -bound_w, bound_w),
        "M": jnp.ones((n_nodes, dim_out), jnp.float32),
        "adj2": jnp.full((n_nodes, n_nodes), 1e-6, jnp.float32),
        "b": jax.random.uniform(kb, (dim_out,), jnp.float32, -bound_b, bound_b),
    }


def _lgc(p: Params, x: jnp.ndarray, base_adj) -> jnp.ndarray:
    """x: (B, N, C_in) -> (B, N, C_out)."""
    h0 = x @ p["W"][0].astype(x.dtype)
    h1 = x @ p["W"][1].astype(x.dtype)
    adj = jnp.asarray(base_adj, x.dtype) + p["adj2"].astype(x.dtype)
    adj = (adj.T + adj) / 2
    eye = jnp.eye(adj.shape[0], dtype=x.dtype)
    m = p["M"].astype(x.dtype)
    out = jnp.einsum("nk,bkc->bnc", adj * eye, m * h0)
    out = out + jnp.einsum("nk,bkc->bnc", adj * (1 - eye), m * h1)
    return out + p["b"].astype(x.dtype)


def _prior_init(key, dim_in: int, dim_out: int, n_nodes: int) -> tuple[Params, Params]:
    """KPA/TPA unit: graph conv + channel BN + ReLU (`KTPFormer.py:88-131`)."""
    p = {"gconv": _lgc_init(key, dim_in, dim_out, n_nodes)}
    bn_p, bn_s = L.batch_norm_init(dim_out)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _prior(p: Params, state: Params, x: jnp.ndarray, base_adj, train: bool
           ) -> tuple[jnp.ndarray, Params]:
    h = _lgc(p["gconv"], x, base_adj)  # (B, N, C)
    # BatchNorm1d over channels: transpose to (B, C, N) node-norm layout
    h, new_bn = L.batch_norm_nodes(p["bn"], state["bn"],
                                   h.transpose(0, 2, 1), train)
    return jax.nn.relu(h.transpose(0, 2, 1)), {"bn": new_bn}


@dataclasses.dataclass(frozen=True)
class KTPFormerConfig:
    num_frame: int = 27
    num_joints: int = 17
    in_chans: int = 2
    embed_dim: int = 256
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    dim_out: int = 3


class KTPFormer:
    def __init__(self, cfg: KTPFormerConfig | None = None, compute_dtype=jnp.float32):
        self.cfg = cfg or KTPFormerConfig()
        self.compute_dtype = compute_dtype
        self.adj = adj_mx_from_skeleton(self.cfg.num_joints)
        self.adj_temporal = adj_mx_from_skeleton_temporal(self.cfg.num_frame)

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        dim = cfg.embed_dim
        keys = jax.random.split(key, 10)
        kpa_p, kpa_s = _prior_init(keys[0], cfg.in_chans, dim, cfg.num_joints)
        tpa1_p, tpa1_s = _prior_init(keys[1], dim, dim, cfg.num_frame)
        tpa2_p, tpa2_s = _prior_init(keys[2], dim, dim, cfg.num_frame)
        params: Params = {
            "kpa": kpa_p,
            "kpa_pos_embed": jnp.zeros((1, cfg.num_joints, dim), jnp.float32),
            "kpa_norm1": L.layer_norm_init(dim),
            "kpa_attn": L.attention_init(keys[3], dim, cfg.qkv_bias),
            "kpa_mlp_norm": L.layer_norm_init(dim),
            "kpa_mlp": L.mlp_init(keys[4], dim, int(dim * cfg.mlp_ratio), dim),
            "tpa1": tpa1_p, "tpa2": tpa2_p,
            "tpa_pos_embed": jnp.zeros((1, cfg.num_frame, dim), jnp.float32),
            "tpa_norm1": L.layer_norm_init(dim),
            "tpa_attn": L.attention_init(keys[5], dim, cfg.qkv_bias),
            "tpa_mlp_norm": L.layer_norm_init(dim),
            "tpa_mlp": L.mlp_init(keys[6], dim, int(dim * cfg.mlp_ratio), dim),
            "spatial_norm": L.layer_norm_init(dim),
            "temporal_norm": L.layer_norm_init(dim),
            "head_norm": L.layer_norm_init(dim),
            "head": L.linear_init(keys[7], dim, cfg.dim_out),
        }
        ste = [L.transformer_block_init(k, dim, cfg.mlp_ratio, cfg.qkv_bias)
               for k in jax.random.split(keys[8], cfg.depth)]
        tte = [L.transformer_block_init(k, dim, cfg.mlp_ratio, cfg.qkv_bias)
               for k in jax.random.split(keys[9], cfg.depth)]
        params["ste"] = jax.tree.map(lambda *xs: jnp.stack(xs), *ste)
        params["tte"] = jax.tree.map(lambda *xs: jnp.stack(xs), *tte)
        state = {"kpa": kpa_s, "tpa1": tpa1_s, "tpa2": tpa2_s}
        return params, state

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x[..., : cfg.in_chans].astype(self.compute_dtype)
        b, f, n, _ = x.shape
        heads, scale = cfg.num_heads, cfg.qk_scale
        new_state: Params = {}

        # KPA_forward: prior + pos embed + MHSA (residual from post-embed)
        tokens = x.reshape(b * f, n, -1)
        tokens, new_state["kpa"] = _prior(params["kpa"], state["kpa"], tokens,
                                          self.adj, train)
        tokens = tokens + params["kpa_pos_embed"].astype(tokens.dtype)
        res = tokens
        tokens = L.layer_norm(params["kpa_norm1"], tokens, eps=1e-5)  # KPAttention hardcodes nn.LayerNorm (`KTPFormer.py:340`)
        tokens = res + L.attention_tokens(params["kpa_attn"], tokens, heads, scale)
        tokens = L.mlp_ln_residual(params["kpa_mlp_norm"], params["kpa_mlp"],
                                   tokens, _EPS)
        tokens = L.layer_norm(params["spatial_norm"], tokens, _EPS)

        # TPA_foward on (B*N, F, C)
        tokens = tokens.reshape(b, f, n, -1).transpose(0, 2, 1, 3).reshape(b * n, f, -1)
        res = tokens
        h, new_state["tpa1"] = _prior(params["tpa1"], state["tpa1"], tokens,
                                      self.adj_temporal, train)
        h, new_state["tpa2"] = _prior(params["tpa2"], state["tpa2"], h,
                                      self.adj_temporal, train)
        tokens = res + h  # StackedTPA residual (`KTPFormer.py:139-144`)
        tokens = tokens + params["tpa_pos_embed"].astype(tokens.dtype)
        res = tokens
        tokens = L.layer_norm(params["tpa_norm1"], tokens, eps=1e-5)  # TPAttention hardcodes nn.LayerNorm
        tokens = res + L.attention_tokens(params["tpa_attn"], tokens, heads, scale)
        tokens = L.mlp_ln_residual(params["tpa_mlp_norm"], params["tpa_mlp"],
                                   tokens, _EPS)
        tokens = L.layer_norm(params["temporal_norm"], tokens, _EPS)

        # trunk: depth alternating ST/TS blocks with shared norms
        x4 = tokens.reshape(b, n, f, -1).transpose(0, 2, 1, 3)

        def pair(carry, step):
            ste_p, tte_p = step
            h = carry.reshape(b * f, n, -1)
            h = L.transformer_block(ste_p, h, heads, scale, _EPS)
            h = L.layer_norm(params["spatial_norm"], h, _EPS)
            h = h.reshape(b, f, n, -1).transpose(0, 2, 1, 3).reshape(b * n, f, -1)
            h = L.transformer_block(tte_p, h, heads, scale, _EPS)
            h = L.layer_norm(params["temporal_norm"], h, _EPS)
            return h.reshape(b, n, f, -1).transpose(0, 2, 1, 3), None

        x4, _ = jax.lax.scan(pair, x4, (params["ste"], params["tte"]))

        out = L.layer_norm(params["head_norm"], x4, eps=1e-5)
        out = L.linear(params["head"], out)
        return out.astype(jnp.float32), new_state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("KTPFormer")
def _build(config):
    cfg = KTPFormerConfig(
        num_frame=config.n_frames, num_joints=config.num_joints,
        in_chans=2, embed_dim=config.dim_feat, depth=config.n_layers,
        num_heads=config.num_heads, mlp_ratio=float(config.mlp_ratio),
        qkv_bias=True, qk_scale=config.qkv_scale)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return KTPFormer(cfg, compute_dtype=dtype)
