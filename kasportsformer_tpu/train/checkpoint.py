"""Checkpointing: orbax-native save/restore + torch `.pth` interchange.

The reference saves torch checkpoints shaped
`{'epoch', 'learning_rate', 'optimizer', 'model': state_dict, 'min_mpjpe',
'wandb_id'}` with DataParallel's `module.`-prefixed keys
(`utils/utilities.py:110-118`, SURVEY.md §5.4). This module:

* converts a reference KASportsFormer state_dict into this framework's
  (params, state) pytrees — handling the `module.` prefix, torch's (out, in)
  Linear layout vs ours (in, out), the ragged BoneMLP stack → padded dense
  tensors, and per-layer module trees → scan-stacked arrays;
* converts back (for exporting weights a reference user can load);
* saves/restores native training state with orbax (fixing the reference's
  resume-key bug, SURVEY.md §5.4, by construction: one schema for save and
  load).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.skeleton import LIMB_COMBINATIONS, MAX_LIMB_COMBINATION

Params = dict[str, Any]

_TRUNK_MODULES = (
    "att_spatial", "att_temporal",
    "graph_spatial", "graph_temporal",
    "bone_spatial", "bone_temporal",
)
_BONE_CHANNELS = ("mlp_dir_x", "mlp_dir_y", "mlp_len")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Drop DataParallel's 'module.' key prefix when present."""
    if any(k.startswith("module.") for k in state_dict):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return dict(state_dict)


def _lin(sd: dict, name: str, bias: bool = True) -> Params:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd: dict, name: str) -> Params:
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _gcn_mixer(sd: dict, prefix: str) -> tuple[Params, Params]:
    p = {
        "U": _lin(sd, f"{prefix}.U"),
        "V": _lin(sd, f"{prefix}.V"),
        "bn": {
            "scale": jnp.asarray(_np(sd[f"{prefix}.batch_norm.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.batch_norm.bias"])),
        },
    }
    state = {"bn": {
        "mean": jnp.asarray(_np(sd[f"{prefix}.batch_norm.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.batch_norm.running_var"])),
    }}
    return p, state


def _bn2d(sd: dict, prefix: str) -> tuple[Params, Params]:
    p = {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
         "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}
    s = {"mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
         "var": jnp.asarray(_np(sd[f"{prefix}.running_var"]))}
    return p, s


def _conv(sd: dict, prefix: str) -> Params:
    p = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _mstcn_mixer(sd: dict, prefix: str) -> tuple[Params, Params]:
    """MultiScaleTCN (`model/modules/tcn.py:25-86`): branches is a ModuleList
    of Sequentials — dilated branches [conv,bn,relu,TemporalConv], maxpool
    branch [conv,bn,relu,maxpool,bn], 1x1 branch [conv,bn]."""
    params: Params = {"branches": []}
    state: Params = {"branches": []}
    for i in (0, 1):  # dilated branches
        bn1p, bn1s = _bn2d(sd, f"{prefix}.branches.{i}.1")
        bn2p, bn2s = _bn2d(sd, f"{prefix}.branches.{i}.3.bn")
        params["branches"].append({
            "conv1": _conv(sd, f"{prefix}.branches.{i}.0"),
            "bn1": bn1p,
            "tconv": _conv(sd, f"{prefix}.branches.{i}.3.conv"),
            "bn2": bn2p,
        })
        state["branches"].append({"bn1": bn1s, "bn2": bn2s})
    bn1p, bn1s = _bn2d(sd, f"{prefix}.branches.2.1")
    bn2p, bn2s = _bn2d(sd, f"{prefix}.branches.2.4")
    params["branches"].append({
        "conv1": _conv(sd, f"{prefix}.branches.2.0"), "bn1": bn1p, "bn2": bn2p})
    state["branches"].append({"bn1": bn1s, "bn2": bn2s})
    bn1p, bn1s = _bn2d(sd, f"{prefix}.branches.3.1")
    params["branches"].append({
        "conv1": _conv(sd, f"{prefix}.branches.3.0"), "bn1": bn1p})
    state["branches"].append({"bn1": bn1s})
    return params, state


def _former(sd: dict, prefix: str, mixer_type: str,
            with_limb_norm: bool = True,
            use_layer_scale: bool = True) -> tuple[Params, Params]:
    p: Params = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _lin(sd, f"{prefix}.mlp.fc1"),
            "fc2": _lin(sd, f"{prefix}.mlp.fc2"),
        },
    }
    if with_limb_norm:
        p["norm1_limb"] = _ln(sd, f"{prefix}.norm1_limb")
    if use_layer_scale:
        p["ls1"] = jnp.asarray(_np(sd[f"{prefix}.layer_scale_1"]))
        p["ls2"] = jnp.asarray(_np(sd[f"{prefix}.layer_scale_2"]))
    state: Params = {}
    if mixer_type == "attention":
        p["mixer"] = {
            "qkv": _lin(sd, f"{prefix}.mixer.qkv"),
            "proj": _lin(sd, f"{prefix}.mixer.proj"),
        }
    elif mixer_type == "bone":
        p["mixer"] = {
            "q": _lin(sd, f"{prefix}.mixer.qkv_q"),
            "kv": _lin(sd, f"{prefix}.mixer.qkv_kv"),
            "proj": _lin(sd, f"{prefix}.mixer.proj"),
        }
    elif mixer_type == "graph":
        p["mixer"], state = _gcn_mixer(sd, f"{prefix}.mixer")
    elif mixer_type == "ms-tcn":
        p["mixer"], state = _mstcn_mixer(sd, f"{prefix}.mixer")
    return p, state


def motionagformer_state_dict_to_params(state_dict: dict[str, Any],
                                        n_layers: int,
                                        graph_only: bool = False,
                                        use_tcn: bool = False,
                                        use_adaptive_fusion: bool = True,
                                        hierarchical: bool = False,
                                        use_layer_scale: bool = True
                                        ) -> tuple[Params, Params]:
    """Reference MotionAGFormer state_dict (`model/MotionAGFormer.py`) ->
    (params, state) for our zoo model."""
    sd = strip_module_prefix(state_dict)
    params: Params = {
        "joints_embed": _lin(sd, "joints_embed"),
        "pos_embed": jnp.asarray(_np(sd["pos_embed"])),
        "norm": _ln(sd, "norm"),
        "rep_logit": _lin(sd, "rep_logit.fc"),
        "head": _lin(sd, "head"),
    }
    layer_params, layer_states = [], []
    for i in range(n_layers):
        lp: Params = {}
        ls: Params = {}
        for name, mixer in (("att_spatial", "attention"),
                            ("att_temporal", "attention")):
            lp[name], _ = _former(sd, f"layers.{i}.{name}", mixer,
                                  with_limb_norm=False,
                                  use_layer_scale=use_layer_scale)
        if graph_only:
            lp["graph_spatial"], ls["graph_spatial"] = _gcn_mixer(
                sd, f"layers.{i}.graph_spatial")
            if use_tcn:
                lp["graph_temporal"], ls["graph_temporal"] = _mstcn_mixer(
                    sd, f"layers.{i}.graph_temporal")
            else:
                lp["graph_temporal"], ls["graph_temporal"] = _gcn_mixer(
                    sd, f"layers.{i}.graph_temporal")
        else:
            lp["graph_spatial"], ls["graph_spatial"] = _former(
                sd, f"layers.{i}.graph_spatial", "graph",
                with_limb_norm=False, use_layer_scale=use_layer_scale)
            lp["graph_temporal"], ls["graph_temporal"] = _former(
                sd, f"layers.{i}.graph_temporal",
                "ms-tcn" if use_tcn else "graph",
                with_limb_norm=False, use_layer_scale=use_layer_scale)
        if use_adaptive_fusion:
            lp["fusion"] = _lin(sd, f"layers.{i}.fusion")
        layer_params.append(lp)
        layer_states.append(ls)
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    state = {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layer_states)}
    return params, state


def _bone_refusion_from_torch(sd: dict) -> Params:
    """17 ragged BoneMLPs (`bone_refusion.mlp_layers.{g}.{channel}.fc{1,2}`)
    → dense padded (G, 3, Kmax, H) stacks."""
    n_groups = len(LIMB_COMBINATIONS)
    h = _np(sd["bone_refusion.mlp_layers.0.mlp_dir_x.fc1.weight"]).shape[0]
    w1 = np.zeros((n_groups, 3, MAX_LIMB_COMBINATION, h), np.float32)
    b1 = np.zeros((n_groups, 3, h), np.float32)
    w2 = np.zeros((n_groups, 3, h), np.float32)
    b2 = np.zeros((n_groups, 3), np.float32)
    for g, combo in enumerate(LIMB_COMBINATIONS):
        k = len(combo)
        for c, ch in enumerate(_BONE_CHANNELS):
            base = f"bone_refusion.mlp_layers.{g}.{ch}"
            w1[g, c, :k] = _np(sd[f"{base}.fc1.weight"]).T  # (k, h)
            b1[g, c] = _np(sd[f"{base}.fc1.bias"])
            w2[g, c] = _np(sd[f"{base}.fc2.weight"])[0]  # (1, h) -> (h,)
            b2[g, c] = _np(sd[f"{base}.fc2.bias"])[0]
    return {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
            "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)}


def _tblock(sd: dict, prefix: str) -> Params:
    """MixSTE/DSTFormer-style pre-LN transformer block (`model/MixSTE.py:299`)."""
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {"qkv": _lin(sd, f"{prefix}.attn.qkv"),
                 "proj": _lin(sd, f"{prefix}.attn.proj")},
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{prefix}.mlp.fc1"),
                "fc2": _lin(sd, f"{prefix}.mlp.fc2")},
    }


def mixste_state_dict_to_params(state_dict: dict[str, Any], depth: int
                                ) -> tuple[Params, Params]:
    """Reference MixSTE2 state_dict (`model/MixSTE.py:405-567`) ->
    (params, state)."""
    sd = strip_module_prefix(state_dict)
    params: Params = {
        "spatial_embed": _lin(sd, "Spatial_patch_to_embedding"),
        "spatial_pos_embed": jnp.asarray(_np(sd["Spatial_pos_embed"])),
        "temporal_pos_embed": jnp.asarray(_np(sd["Temporal_pos_embed"])),
        "spatial_norm": _ln(sd, "Spatial_norm"),
        "temporal_norm": _ln(sd, "Temporal_norm"),
        "head_norm": _ln(sd, "head.0"),
        "head": _lin(sd, "head.1"),
    }
    ste = [_tblock(sd, f"STEblocks.{i}") for i in range(depth)]
    tte = [_tblock(sd, f"TTEblocks.{i}") for i in range(depth)]
    params["ste0"], params["tte0"] = ste[0], tte[0]
    if depth > 1:
        params["ste_rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *ste[1:])
        params["tte_rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *tte[1:])
    return params, {}


def mixste_seperate_state_dict_to_params(state_dict: dict[str, Any],
                                         depth: int) -> tuple[Params, Params]:
    """Reference `MixSTE_seperate` state_dict (`model/MixSTE.py:570-741`) ->
    (params, state) for `zoo.mixste_legacy.MixSTESeperate`."""
    sd = strip_module_prefix(state_dict)
    params: Params = {
        "spatial_embed": _lin(sd, "Spatial_patch_to_embedding"),
        "spatial_pos_embed": jnp.asarray(_np(sd["Spatial_pos_embed"])),
        "temporal_pos_embed": jnp.asarray(_np(sd["Temporal_pos_embed"])),
        "spatial_norm": _ln(sd, "Spatial_norm"),
        "temporal_norm": _ln(sd, "Temporal_norm"),
        "head_norm": _ln(sd, "head.0"),
        "head": _lin(sd, "head.1"),
        "ste": [_tblock(sd, f"STEblocks.{i}") for i in range(depth)],
        "tte": [_tblock(sd, f"TTEblocks.{i}") for i in range(depth)],
    }
    return params, {}


def _conv1x1_as_linear(sd: dict, name: str) -> Params:
    """1x1 Conv1d (out, in, 1) -> linear {'w': (in, out), 'b': (out,)}
    (the changedim reduction/improve convs, `model/MixSTE.py:323-328`)."""
    w = _np(sd[f"{name}.weight"])[:, :, 0].T
    p = {"w": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def mixste_pooling_state_dict_to_params(state_dict: dict[str, Any],
                                        depth: int) -> tuple[Params, Params]:
    """Reference `MixSTEPooling` state_dict (`model/MixSTE.py:1084-1287`) ->
    (params, state) for `zoo.mixste_legacy.MixSTEPooling`."""
    sd = strip_module_prefix(state_dict)
    tte = []
    for i in range(depth):
        blk = _tblock(sd, f"TTEblocks.{i}")
        if f"TTEblocks.{i}.reduction.weight" in sd:
            blk["reduction"] = _conv1x1_as_linear(sd, f"TTEblocks.{i}.reduction")
        if f"TTEblocks.{i}.improve.weight" in sd:
            blk["improve"] = _conv1x1_as_linear(sd, f"TTEblocks.{i}.improve")
        tte.append(blk)
    params: Params = {
        "spatial_embed": _lin(sd, "Spatial_patch_to_embedding"),
        "spatial_pos_embed": jnp.asarray(_np(sd["Spatial_pos_embed"])),
        "temporal_pos_embed": jnp.asarray(_np(sd["Temporal_pos_embed"])),
        "spatial_norms": [_ln(sd, f"Spatial_norm.{i}") for i in range(depth)],
        "temporal_norms": [_ln(sd, f"Temporal_norm.{i}") for i in range(depth)],
        "head_norm": _ln(sd, "head.0"),
        "head": _lin(sd, "head.1"),
        "ste": [_tblock(sd, f"STEblocks.{i}") for i in range(depth)],
        "tte": tte,
    }
    return params, {}


def prob_attention_state_dict_to_params(state_dict: dict[str, Any]) -> Params:
    """Reference `ProbAttention` module state_dict (`model/MixSTE.py:187-192`)
    -> params for `zoo.mixste_legacy.prob_attention`."""
    sd = strip_module_prefix(state_dict)
    return {
        "query": _lin(sd, "query_projection"),
        "key": _lin(sd, "key_projection"),
        "value": _lin(sd, "value_projection"),
        "proj": _lin(sd, "proj"),
    }


def stcformer_state_dict_to_params(state_dict: dict[str, Any], n_layers: int
                                   ) -> tuple[Params, Params]:
    """Reference STCFormer `Model` state_dict (`model/STCFormer.py`) ->
    (params, state)."""
    sd = strip_module_prefix(state_dict)
    params: Params = {
        "pose_emb": _lin(sd, "pose_emb"),
        "head": _lin(sd, "regress_head"),
    }
    blocks = []
    for i in range(n_layers):
        base = f"stcformer.stc_block.{i}"
        blocks.append({
            "norm": _ln(sd, f"{base}.stc_att.layer_norm"),
            "qkv": _lin(sd, f"{base}.stc_att.qkv"),
            "proj": _lin(sd, f"{base}.stc_att.proj"),
            "sep2_s": _conv(sd, f"{base}.stc_att.sep2_s"),
            "sep2_t": _conv(sd, f"{base}.stc_att.sep2_t"),
            "part_embed": jnp.asarray(_np(sd[f"{base}.stc_att.emb.weight"])),
            "mlp_norm": _ln(sd, f"{base}.layer_norm"),
            "mlp": {"fc1": _lin(sd, f"{base}.mlp.fc1"),
                    "fc2": _lin(sd, f"{base}.mlp.fc2")},
        })
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params, {}


def dstformer_state_dict_to_params(state_dict: dict[str, Any], depth: int,
                                   att_fuse: bool = True
                                   ) -> tuple[Params, Params]:
    """Reference DSTformer state_dict (`model/DSTFormer.py:278-371`) ->
    (params, state)."""
    sd = strip_module_prefix(state_dict)
    params: Params = {
        "joints_embed": _lin(sd, "joints_embed"),
        "pos_embed": jnp.asarray(_np(sd["pos_embed"])),
        "temp_embed": jnp.asarray(_np(sd["temp_embed"])),
        "norm": _ln(sd, "norm"),
        "pre_logits": _lin(sd, "pre_logits.fc"),
        "head": _lin(sd, "head"),
    }

    def block(base: str) -> Params:
        return {
            "norm1_s": _ln(sd, f"{base}.norm1_s"),
            "norm1_t": _ln(sd, f"{base}.norm1_t"),
            "norm2_s": _ln(sd, f"{base}.norm2_s"),
            "norm2_t": _ln(sd, f"{base}.norm2_t"),
            "attn_s": {"qkv": _lin(sd, f"{base}.attn_s.qkv"),
                       "proj": _lin(sd, f"{base}.attn_s.proj")},
            "attn_t": {"qkv": _lin(sd, f"{base}.attn_t.qkv"),
                       "proj": _lin(sd, f"{base}.attn_t.proj")},
            "mlp_s": {"fc1": _lin(sd, f"{base}.mlp_s.fc1"),
                      "fc2": _lin(sd, f"{base}.mlp_s.fc2")},
            "mlp_t": {"fc1": _lin(sd, f"{base}.mlp_t.fc1"),
                      "fc2": _lin(sd, f"{base}.mlp_t.fc2")},
        }

    params["blocks_st"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[block(f"blocks_st.{i}") for i in range(depth)])
    params["blocks_ts"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[block(f"blocks_ts.{i}") for i in range(depth)])
    if att_fuse:
        params["ts_attn"] = {
            "w": jnp.stack([jnp.asarray(_np(sd[f"ts_attn.{i}.weight"]).T)
                            for i in range(depth)]),
            "b": jnp.stack([jnp.asarray(_np(sd[f"ts_attn.{i}.bias"]))
                            for i in range(depth)]),
        }
    return params, {}


def ktpformer_state_dict_to_params(state_dict: dict[str, Any], depth: int
                                   ) -> tuple[Params, Params]:
    """Reference KTPFormer state_dict (`model/KTPFormer.py:472-618`) ->
    (params, state)."""
    sd = strip_module_prefix(state_dict)

    def prior(base: str) -> tuple[Params, Params]:
        p = {"gconv": {
            "W": jnp.asarray(_np(sd[f"{base}.gconv.W"])),
            "M": jnp.asarray(_np(sd[f"{base}.gconv.M"])),
            "adj2": jnp.asarray(_np(sd[f"{base}.gconv.adj2"])),
            "b": jnp.asarray(_np(sd[f"{base}.gconv.bias"])),
        }, "bn": {
            "scale": jnp.asarray(_np(sd[f"{base}.bn.weight"])),
            "bias": jnp.asarray(_np(sd[f"{base}.bn.bias"])),
        }}
        s = {"bn": {
            "mean": jnp.asarray(_np(sd[f"{base}.bn.running_mean"])),
            "var": jnp.asarray(_np(sd[f"{base}.bn.running_var"])),
        }}
        return p, s

    kpa_p, kpa_s = prior("kpattention.attn.kpa")
    tpa1_p, tpa1_s = prior("tpattention.attn.tpa.gconv1")
    tpa2_p, tpa2_s = prior("tpattention.attn.tpa.gconv2")
    params: Params = {
        "kpa": kpa_p,
        "kpa_pos_embed": jnp.asarray(_np(sd["kpattention.attn.Spatial_pos_embed"])),
        "kpa_norm1": _ln(sd, "kpattention.attn.norm1"),
        "kpa_attn": {"qkv": _lin(sd, "kpattention.attn.qkv"),
                     "proj": _lin(sd, "kpattention.attn.proj")},
        "kpa_mlp_norm": _ln(sd, "kpattention.norm2"),
        "kpa_mlp": {"fc1": _lin(sd, "kpattention.mlp.fc1"),
                    "fc2": _lin(sd, "kpattention.mlp.fc2")},
        "tpa1": tpa1_p, "tpa2": tpa2_p,
        "tpa_pos_embed": jnp.asarray(_np(sd["tpattention.attn.Temporal_pos_embed"])),
        "tpa_norm1": _ln(sd, "tpattention.attn.norm1"),
        "tpa_attn": {"qkv": _lin(sd, "tpattention.attn.qkv"),
                     "proj": _lin(sd, "tpattention.attn.proj")},
        "tpa_mlp_norm": _ln(sd, "tpattention.norm2"),
        "tpa_mlp": {"fc1": _lin(sd, "tpattention.mlp.fc1"),
                    "fc2": _lin(sd, "tpattention.mlp.fc2")},
        "spatial_norm": _ln(sd, "Spatial_norm"),
        "temporal_norm": _ln(sd, "Temporal_norm"),
        "head_norm": _ln(sd, "head.0"),
        "head": _lin(sd, "head.1"),
    }
    params["ste"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_tblock(sd, f"STEblocks.{i}") for i in range(depth)])
    params["tte"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_tblock(sd, f"TTEblocks.{i}") for i in range(depth)])
    state = {"kpa": kpa_s, "tpa1": tpa1_s, "tpa2": tpa2_s}
    return params, state


def d3dp_state_dict_to_params(state_dict: dict[str, Any], depth: int
                              ) -> tuple[Params, Params]:
    """Reference D3DP state_dict (`model/diffusionpose.py`) -> denoiser
    (params, state). Diffusion schedule buffers are recomputed (they are
    deterministic functions of `timesteps`)."""
    sd = strip_module_prefix(state_dict)
    sd = {k[len("pose_estimator."):]: v for k, v in sd.items()
          if k.startswith("pose_estimator.")}
    params: Params = {
        "spatial_embed": _lin(sd, "Spatial_patch_to_embedding"),
        "spatial_pos_embed": jnp.asarray(_np(sd["Spatial_pos_embed"])),
        "temporal_pos_embed": jnp.asarray(_np(sd["Temporal_pos_embed"])),
        "time_mlp": {"fc1": _lin(sd, "time_mlp.1"),
                     "fc2": _lin(sd, "time_mlp.3")},
        "spatial_norm": _ln(sd, "Spatial_norm"),
        "temporal_norm": _ln(sd, "Temporal_norm"),
        "head_norm": _ln(sd, "head.0"),
        "head": _lin(sd, "head.1"),
    }
    ste = [_tblock(sd, f"STEblocks.{i}") for i in range(depth)]
    tte = [_tblock(sd, f"TTEblocks.{i}") for i in range(depth)]
    params["ste0"], params["tte0"] = ste[0], tte[0]
    if depth > 1:
        params["ste_rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *ste[1:])
        params["tte_rest"] = jax.tree.map(lambda *xs: jnp.stack(xs), *tte[1:])
    return params, {}


def hdformer_state_dict_to_params(state_dict: dict[str, Any],
                                  attention: bool = True, max_hop: int = 4
                                  ) -> tuple[Params, Params]:
    """Reference HDFormer `vertex_model.Model` state_dict -> (params, state)."""
    from kasportsformer_tpu.models.zoo.hdformer import HOP_EDGES, _DOWN_SPEC

    sd = strip_module_prefix(state_dict)

    def foa(base: str, has_down: bool) -> tuple[Params, Params]:
        p: Params = {"PA": jnp.asarray(_np(sd[f"{base}.PA"])), "subsets": []}
        for j in range(3):
            p["subsets"].append({
                "linear": _lin(sd, f"{base}.linears.{j}"),
                "conv_a": _conv(sd, f"{base}.conv_a.{j}"),
                "conv_b": _conv(sd, f"{base}.conv_b.{j}"),
                "conv_d": _conv(sd, f"{base}.conv_d.{j}"),
            })
        bn_p, bn_s = _bn2d(sd, f"{base}.bn")
        p["bn"] = bn_p
        s: Params = {"bn": bn_s}
        if has_down:
            dbn_p, dbn_s = _bn2d(sd, f"{base}.down.1")
            p["down"] = {"conv": _conv(sd, f"{base}.down.0"), "bn": dbn_p}
            s["down_bn"] = dbn_s
        return p, s

    def hoa(base: str, has_residual_conv: bool, block_max_hop: int
            ) -> tuple[Params, Params]:
        has_down = f"{base}.foa_block.down.0.weight" in sd
        foa_p, foa_s = foa(f"{base}.foa_block", has_down)
        bn1_p, bn1_s = _bn2d(sd, f"{base}.tcn_v.0")
        bn2_p, bn2_s = _bn2d(sd, f"{base}.tcn_v.3")
        p: Params = {"foa": foa_p, "tcn_conv": _conv(sd, f"{base}.tcn_v.2"),
                     "tcn_bn1": bn1_p, "tcn_bn2": bn2_p}
        s: Params = {"foa": foa_s, "tcn_bn1": bn1_s, "tcn_bn2": bn2_s}
        if has_residual_conv:
            rbn_p, rbn_s = _bn2d(sd, f"{base}.residual_v.1")
            p["residual"] = {"conv": _conv(sd, f"{base}.residual_v.0"),
                             "bn": rbn_p}
            s["residual_bn"] = rbn_s
        if attention:
            p["attn"] = {k: _lin(sd, f"{base}.cross_attn.to_{k[-1]}")
                         for k in ("to_q", "to_k", "to_v")}
            p["attn"]["proj"] = _lin(sd, f"{base}.cross_attn.proj")
            p["norm_v"] = _ln(sd, f"{base}.norm_v")
            p["mlp"] = {"fc1": _lin(sd, f"{base}.mlp.fc1"),
                        "fc2": _lin(sd, f"{base}.mlp.fc2")}
            p["norm_mlp"] = _ln(sd, f"{base}.norm_mlp")
            hop_linears = []
            for hop_i in range(block_max_hop - 1):
                parts = HOP_EDGES[hop_i + 2]
                hop_linears.append(
                    [_lin(sd, f"{base}.linears.{hop_i}.{i}")
                     for i in range(len(parts))])
            p["hop_linears"] = hop_linears
        return p, s

    params: Params = {}
    state: Params = {}
    if "backbone.data_bn.weight" in sd:
        bn_p, bn_s = _bn2d(sd, "backbone.data_bn")
        params["data_bn"], state["data_bn"] = bn_p, bn_s
    down, down_s = [], []
    for i, (pi, po, stride, residual) in enumerate(_DOWN_SPEC):
        has_res_conv = f"backbone.downsample.{i}.residual_v.0.weight" in sd
        p, s = hoa(f"backbone.downsample.{i}", has_res_conv, 2)
        down.append(p)
        down_s.append(s)
    up, up_s = [], []
    for i in range(4):
        has_res_conv = f"backbone.upsample.{i}.residual_v.0.weight" in sd
        p, s = hoa(f"backbone.upsample.{i}", has_res_conv, 2)
        up.append(p)
        up_s.append(s)
    merge, merge_s = [], []
    for i in range(4):
        has_res_conv = f"backbone.merge.{i}.residual_v.0.weight" in sd
        p, s = hoa(f"backbone.merge.{i}", has_res_conv, max_hop)
        merge.append(p)
        merge_s.append(s)
    params.update(down=down, up=up, merge=merge)
    state.update(down=down_s, up=up_s, merge=merge_s)
    params["joint_regressor"] = _conv(sd, "joint_regressor")
    params["input_adjust"] = _lin(sd, "input_adjust")
    params["output_adjust"] = _lin(sd, "output_adjust")
    return params, state


def torch_state_dict_to_params(state_dict: dict[str, Any], n_layers: int = 26
                               ) -> tuple[Params, Params]:
    """Reference KASportsFormer state_dict -> (params, state) pytrees."""
    sd = strip_module_prefix(state_dict)
    params: Params = {
        "joints_embed": _lin(sd, "joints_embed"),
        "bone_embed": _lin(sd, "bone_embed"),
        "limb_embed": _lin(sd, "limb_embed"),
        "pos_embed": jnp.asarray(_np(sd["pos_embed"])),
        "bone_pos_embed": jnp.asarray(_np(sd["bone_pos_embed"])),
        "limb_pos_embed": jnp.asarray(_np(sd["limb_pos_embed"])),
        "bone_refusion": _bone_refusion_from_torch(sd),
        "norm": _ln(sd, "norm"),
        "rep_logit": _lin(sd, "rep_logit.fc"),
        "head": _lin(sd, "head"),
    }
    mixer_of = dict(zip(_TRUNK_MODULES,
                        ("attention", "attention", "graph", "graph", "bone", "bone")))
    layer_params, layer_states = [], []
    for i in range(n_layers):
        lp: Params = {}
        ls: Params = {}
        for name in _TRUNK_MODULES:
            p, s = _former(sd, f"layers_with_bone.{i}.{name}", mixer_of[name])
            lp[name] = p
            if s:
                ls[name] = s
        lp["fusion"] = _lin(sd, f"layers_with_bone.{i}.fusion_three_channel")
        layer_params.append(lp)
        layer_states.append(ls)
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    state = {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layer_states)}
    return params, state


def params_to_torch_state_dict(params: Params, state: Params,
                               module_prefix: bool = True) -> dict[str, np.ndarray]:
    """(params, state) -> a reference-layout state_dict (numpy values), with
    the DataParallel 'module.' prefix the reference's load sites expect
    (`train_and_evaluate_sp.py:164-174`)."""
    out: dict[str, np.ndarray] = {}

    def put(key, arr):
        out[key] = np.asarray(arr)

    def put_lin(key, p):
        put(f"{key}.weight", np.asarray(p["w"]).T)
        if "b" in p:
            put(f"{key}.bias", p["b"])

    def put_ln(key, p):
        put(f"{key}.weight", p["scale"])
        put(f"{key}.bias", p["bias"])

    put_lin("joints_embed", params["joints_embed"])
    put_lin("bone_embed", params["bone_embed"])
    put_lin("limb_embed", params["limb_embed"])
    put("pos_embed", params["pos_embed"])
    put("bone_pos_embed", params["bone_pos_embed"])
    put("limb_pos_embed", params["limb_pos_embed"])
    put_ln("norm", params["norm"])
    put_lin("rep_logit.fc", params["rep_logit"])
    put_lin("head", params["head"])

    br = params["bone_refusion"]
    for g, combo in enumerate(LIMB_COMBINATIONS):
        k = len(combo)
        for c, ch in enumerate(_BONE_CHANNELS):
            base = f"bone_refusion.mlp_layers.{g}.{ch}"
            put(f"{base}.fc1.weight", np.asarray(br["w1"])[g, c, :k].T)
            put(f"{base}.fc1.bias", np.asarray(br["b1"])[g, c])
            put(f"{base}.fc2.weight", np.asarray(br["w2"])[g, c][None, :])
            put(f"{base}.fc2.bias", np.asarray(br["b2"])[g, c][None])

    n_layers = int(jax.tree.leaves(params["layers"])[0].shape[0])
    for i in range(n_layers):
        lp = jax.tree.map(lambda x: x[i], params["layers"])
        ls = jax.tree.map(lambda x: x[i], state["layers"])
        for name in _TRUNK_MODULES:
            prefix = f"layers_with_bone.{i}.{name}"
            p = lp[name]
            put_ln(f"{prefix}.norm1", p["norm1"])
            put_ln(f"{prefix}.norm1_limb", p["norm1_limb"])
            put_ln(f"{prefix}.norm2", p["norm2"])
            put_lin(f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
            put_lin(f"{prefix}.mlp.fc2", p["mlp"]["fc2"])
            put(f"{prefix}.layer_scale_1", p["ls1"])
            put(f"{prefix}.layer_scale_2", p["ls2"])
            m = p["mixer"]
            if "qkv" in m:
                put_lin(f"{prefix}.mixer.qkv", m["qkv"])
                put_lin(f"{prefix}.mixer.proj", m["proj"])
            elif "q" in m:
                put_lin(f"{prefix}.mixer.qkv_q", m["q"])
                put_lin(f"{prefix}.mixer.qkv_kv", m["kv"])
                put_lin(f"{prefix}.mixer.proj", m["proj"])
            else:
                put_lin(f"{prefix}.mixer.U", m["U"])
                put_lin(f"{prefix}.mixer.V", m["V"])
                put(f"{prefix}.mixer.batch_norm.weight", m["bn"]["scale"])
                put(f"{prefix}.mixer.batch_norm.bias", m["bn"]["bias"])
                put(f"{prefix}.mixer.batch_norm.running_mean",
                    ls[name]["bn"]["mean"])
                put(f"{prefix}.mixer.batch_norm.running_var",
                    ls[name]["bn"]["var"])
                put(f"{prefix}.mixer.batch_norm.num_batches_tracked",
                    np.zeros((), np.int64))
        put_lin(f"layers_with_bone.{i}.fusion_three_channel", lp["fusion"])

    if module_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Load a reference `.pth` file. Accepts both a bare state_dict and the
    reference's full payload dict; returns the state_dict."""
    import torch  # local import: torch is only needed for .pth interchange

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        payload = payload["model"]
    return strip_module_prefix(payload)


# ------------------------------------------------------------ orbax native


def save_native(directory: str, step: int, payload: Params) -> None:
    """Save a native checkpoint (params/state/opt_state/host metadata)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(os.path.join(directory, f"step_{step}"), payload, force=True)


def restore_native(directory: str, step: int | None = None,
                   template: Params | None = None) -> Params:
    """Restore from a checkpoint directory. Accepts either the parent dir
    (picks `step` or, when None, the latest step) or a `step_N` dir itself."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if not os.path.basename(directory).startswith("step_"):
        if step is None:
            step = latest_native_step(directory)
            if step is None:
                raise FileNotFoundError(f"no step_* checkpoints under {directory}")
        directory = os.path.join(directory, f"step_{step}")
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        if template is not None:
            return ckptr.restore(directory, item=template)
        return ckptr.restore(directory)


def latest_native_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(directory)
             if d.startswith("step_")]
    return max(steps) if steps else None
