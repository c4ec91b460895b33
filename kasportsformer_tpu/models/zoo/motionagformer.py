"""MotionAGFormer — KASportsFormer's direct ancestor (attention branch +
graph branch with 2-way adaptive fusion). TPU-native rebuild of
`model/MotionAGFormer.py`:

* AGFormerBlock = our `former_module` with no limb norm;
* the layer stack runs under `jax.lax.scan` over stacked layer params;
* supports the reference's variants: `hierarchical` (channel-split streams,
  `MotionAGFormer.py:141-152`), `graph_only` (plain GCN/TCN graph branch,
  `:97-109`), `use_tcn` (MS-TCN temporal mixer in the graph branch).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.models import layers as L
from kasportsformer_tpu.models.registry import register_model
from kasportsformer_tpu.skeleton import spatial_adjacency

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MotionAGFormerConfig:
    n_layers: int = 16
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
    use_tcn: bool = False
    graph_only: bool = False


def _block_init(key, cfg: MotionAGFormerConfig) -> tuple[Params, Params]:
    dim = cfg.dim_feat // 2 if cfg.hierarchical else cfg.dim_feat
    keys = jax.random.split(key, 5)
    params: Params = {}
    state: Params = {}

    def former(k, mixer, mode):
        return L.former_module_init(
            k, dim, cfg.mlp_ratio, mixer, mode, cfg.num_heads, cfg.qkv_bias,
            cfg.layer_scale_init_value, cfg.n_frames, with_limb_norm=False,
            use_layer_scale=cfg.use_layer_scale)

    params["att_spatial"], _ = former(keys[0], "attention", "spatial")
    params["att_temporal"], _ = former(keys[1], "attention", "temporal")
    if cfg.graph_only:
        params["graph_spatial"], st = L.gcn_init(keys[2], dim, dim, 17)
        state["graph_spatial"] = st
        if cfg.use_tcn:
            params["graph_temporal"], st = L.multi_scale_tcn_init(keys[3], dim, dim)
        else:
            params["graph_temporal"], st = L.gcn_init(keys[3], dim, dim, cfg.n_frames)
        state["graph_temporal"] = st
    else:
        params["graph_spatial"], st = former(keys[2], "graph", "spatial")
        state["graph_spatial"] = st
        params["graph_temporal"], st = former(
            keys[3], "ms-tcn" if cfg.use_tcn else "graph", "temporal")
        state["graph_temporal"] = st
    if cfg.use_adaptive_fusion:
        # allocated even in hierarchical mode (unused in forward), matching
        # the reference's parameter layout (`MotionAGFormer.py:128-131`)
        params["fusion"] = L.adaptive_fusion_init(dim, 2)
    return params, state


def _block_apply(p: Params, state: Params, x: jnp.ndarray,
                 cfg: MotionAGFormerConfig, train: bool,
                 spatial_norm_adj,
                 static_temporal_adj=None) -> tuple[jnp.ndarray, Params]:
    def former(name, mixer, mode, inp, st=None):
        return L.former_module(
            p[name], st if st is not None else {}, inp, mixer, mode,
            cfg.num_heads, train, qk_scale=cfg.qkv_scale,
            spatial_norm_adj=spatial_norm_adj, neighbour_num=cfg.neighbour_num,
            static_temporal_adj=static_temporal_adj,
            use_layer_scale=cfg.use_layer_scale)

    if cfg.hierarchical:
        c = x.shape[-1]
        x_attn_in, x_graph_in = x[..., : c // 2], x[..., c // 2:]
    else:
        x_attn_in = x_graph_in = x

    x_attn, _ = former("att_spatial", "attention", "spatial", x_attn_in)
    x_attn, _ = former("att_temporal", "attention", "temporal", x_attn)

    graph_in = x_graph_in + x_attn if cfg.hierarchical else x_graph_in
    new_state: Params = {}
    if cfg.graph_only:
        x_graph, new_state["graph_spatial"] = L.gcn(
            p["graph_spatial"], state["graph_spatial"], graph_in, "spatial",
            train, spatial_norm_adj=spatial_norm_adj)
        if cfg.use_tcn:
            x_graph, new_state["graph_temporal"] = L.multi_scale_tcn(
                p["graph_temporal"], state["graph_temporal"], x_graph, train)
        else:
            x_graph, new_state["graph_temporal"] = L.gcn(
                p["graph_temporal"], state["graph_temporal"], x_graph,
                "temporal", train, neighbour_num=cfg.neighbour_num,
                static_temporal_adj=static_temporal_adj)
    else:
        x_graph, new_state["graph_spatial"] = former(
            "graph_spatial", "graph", "spatial", graph_in,
            st=state["graph_spatial"])
        x_graph, new_state["graph_temporal"] = former(
            "graph_temporal", "ms-tcn" if cfg.use_tcn else "graph", "temporal",
            x_graph, st=state["graph_temporal"])

    if cfg.hierarchical:
        out = jnp.concatenate([x_attn, x_graph], axis=-1)
    elif cfg.use_adaptive_fusion:
        out = L.adaptive_fusion(p["fusion"], [x_attn, x_graph])
    else:
        out = (x_attn + x_graph) * 0.5
    return out, new_state


class MotionAGFormer:
    """Functional wrapper: init/apply, (B,T,17,C) -> (B,T,17,3)."""

    def __init__(self, cfg: MotionAGFormerConfig | None = None,
                 compute_dtype=jnp.float32):
        self.cfg = cfg or MotionAGFormerConfig()
        self.compute_dtype = compute_dtype
        adj = spatial_adjacency(self.cfg.num_joints)
        dinv = adj.sum(-1) ** -0.5
        self.spatial_norm_adj = (adj * dinv[:, None] * dinv[None, :]).astype(np.float32)
        self.static_temporal_adj = (
            None if self.cfg.use_temporal_similarity
            else L.temporal_adjacency(self.cfg.n_frames,
                                      self.cfg.temporal_connection_len))

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        keys = jax.random.split(key, 4)
        params: Params = {
            "joints_embed": L.linear_init(keys[0], cfg.dim_in, cfg.dim_feat),
            "pos_embed": jnp.zeros((1, cfg.num_joints, cfg.dim_feat), jnp.float32),
            "norm": L.layer_norm_init(cfg.dim_feat),
            "rep_logit": L.linear_init(keys[1], cfg.dim_feat, cfg.dim_rep),
            "head": L.linear_init(keys[2], cfg.dim_rep, cfg.dim_out),
        }
        per_layer = [_block_init(k, cfg)
                     for k in jax.random.split(keys[3], cfg.n_layers)]
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                                        *[p for p, _ in per_layer])
        state = {"layers": jax.tree.map(lambda *xs: jnp.stack(xs),
                                        *[s for _, s in per_layer])}
        return params, state

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False, return_rep: bool = False
              ) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x.astype(self.compute_dtype)
        x = L.linear(params["joints_embed"], x) + params["pos_embed"].astype(x.dtype)

        adj = self.spatial_norm_adj
        t_adj = self.static_temporal_adj

        def body(carry, step):
            layer_params, layer_state = step
            out, new_state = _block_apply(layer_params, layer_state, carry,
                                          cfg, train, adj,
                                          static_temporal_adj=t_adj)
            return out, new_state

        x, new_layer_states = jax.lax.scan(
            body, x, (params["layers"], state["layers"]))

        x = L.layer_norm(params["norm"], x)
        x = jnp.tanh(L.linear(params["rep_logit"], x))
        if return_rep:
            return x, {"layers": new_layer_states}
        y = L.linear(params["head"], x)
        return y.astype(jnp.float32), {"layers": new_layer_states}

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("MotionAGFormer")
def _build(config):
    cfg = MotionAGFormerConfig(
        n_layers=config.n_layers, dim_in=config.dim_in, dim_feat=config.dim_feat,
        dim_rep=config.dim_rep, dim_out=config.dim_out,
        mlp_ratio=float(config.mlp_ratio), num_heads=config.num_heads,
        qkv_bias=config.qkv_bias, qkv_scale=config.qkv_scale,
        num_joints=config.num_joints, n_frames=config.n_frames,
        use_layer_scale=config.use_layer_scale,
        layer_scale_init_value=config.layer_scale_init_value,
        use_adaptive_fusion=config.use_adaptive_fusion,
        use_temporal_similarity=config.use_temporal_similarity,
        neighbour_num=config.neighbour_num,
        temporal_connection_len=config.temporal_connection_len,
        hierarchical=config.hierarchical, use_tcn=config.use_tcn,
        graph_only=config.graph_only)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return MotionAGFormer(cfg, compute_dtype=dtype)
