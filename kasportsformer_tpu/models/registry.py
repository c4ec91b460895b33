"""Model factory.

TPU-native counterpart of `model/model_tools.py:79-96`: dispatches a config's
`model_name` to a model builder. Like the reference, `KASportsFormer` is the
fully wired flagship; zoo models register here as they land.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name.lower()] = fn
        return fn
    return deco


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def _ensure_zoo_registered() -> None:
    """Zoo modules register themselves on import; pull them in on first
    factory miss so `build_model(...MixSTE...)` works without the caller
    importing `kasportsformer_tpu.models.zoo` explicitly."""
    import kasportsformer_tpu.models.zoo  # noqa: F401


def build_model(config):
    """Build a model from a `kasportsformer_tpu.config.Config` (or any object
    with the model fields). Raises on unknown names like
    `model/model_tools.py:93-94`."""
    name = config.model_name.lower()
    if name not in _REGISTRY:
        _ensure_zoo_registered()
    if name not in _REGISTRY:
        raise ValueError(
            f"unrecognized model name {config.model_name!r}; "
            f"available: {available_models()}"
        )
    return _REGISTRY[name](config)


@register_model("KASportsFormer")
def _build_kasportsformer(config):
    from kasportsformer_tpu.models.kasportsformer import (
        KASportsFormer,
        KASportsFormerConfig,
    )

    cfg = KASportsFormerConfig(
        n_layers=config.n_layers,
        dim_in=config.dim_in,
        dim_feat=config.dim_feat,
        dim_rep=config.dim_rep,
        dim_out=config.dim_out,
        mlp_ratio=float(config.mlp_ratio),
        num_heads=config.num_heads,
        qkv_bias=config.qkv_bias,
        qkv_scale=config.qkv_scale,
        num_joints=config.num_joints,
        n_frames=config.n_frames,
        use_layer_scale=config.use_layer_scale,
        layer_scale_init_value=config.layer_scale_init_value,
        use_adaptive_fusion=config.use_adaptive_fusion,
        use_temporal_similarity=config.use_temporal_similarity,
        neighbour_num=config.neighbour_num,
        temporal_connection_len=config.temporal_connection_len,
        hierarchical=config.hierarchical,
        # remat policy (measured round 3, v5e): with the fused MLP tails
        # under training (their Pallas VJP recomputes in VMEM), saving the
        # 15 MB/tail 'mlp_tail' outputs skips tail replay entirely — 219
        # vs 211 clips/s at batch 128, and light enough for batch 256
        # (the old 'mlp_hidden' policy saved 60 MB/tail and OOM'd there).
        # 'mlp_hidden' stays listed for the KASF_TRAIN_FUSED_MLP=0 path,
        # where the XLA-form MLP names it (unmatched names are inert).
        remat_names=("attn_core", "gcn_agg", "mlp_tail", "mlp_hidden"),
    )
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return KASportsFormer(cfg, compute_dtype=dtype)
