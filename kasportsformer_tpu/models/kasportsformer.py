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

        # 26-layer trunk under lax.scan; layer 0 feeds the embedded bone
        # stream into the bone branch, later layers feed the fused stream
        # (`model/KASportsFormer.py:332-336`).
        is_first = jnp.arange(cfg.n_layers) == 0
        adj = self.spatial_norm_adj
        t_adj = self.static_temporal_adj

        # remat the layer body: without it the scan saves every layer's
        # activations for backward (26 x (B,27,17,512) MLP temps = ~9 GB at
        # batch 256), blowing HBM. The policy keeps the attention-core
        # outputs (the expensive recompute; ~3 GB at batch 256) and replays
        # only the cheap linears/norms.
        @functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_core", "gcn_agg"))
        def body(carry, step):
            layer_params, layer_state, first = step
            bone_in = jnp.where(first, x_bone, carry)
            out, new_state = trunk_layer_apply(
                layer_params, layer_state, carry, bone_in, x_limb, cfg, train,
                adj, static_temporal_adj=t_adj)
            return out, new_state

        x, new_layer_states = jax.lax.scan(
            body, x, (params["layers"], state["layers"], is_first),
            unroll=cfg.scan_unroll)

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
