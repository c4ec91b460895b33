"""Typed configuration.

The public contract is the reference's flat YAML schema (~50 keys across 8
groups, see `configs/*.yaml` and SURVEY.md §5.6): the four shipped reference
config files must load unchanged. Unlike the reference (untyped EasyDict, no
validation), keys are parsed into a frozen dataclass with defaults, type
coercion and unknown-key warnings. A `!include` constructor is supported for
yaml/json/text includes, mirroring `utils/utilities.py:25-49` (and registered
on the loader actually used, unlike the reference where it was registered on
the wrong loader class).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from dataclasses import dataclass
from typing import Any

import yaml

log = logging.getLogger(__name__)


class _IncludeLoader(yaml.SafeLoader):
    """SafeLoader with `!include` support (yaml/json/anything-as-text)."""

    def __init__(self, stream) -> None:
        try:
            self._root = os.path.split(stream.name)[0]
        except AttributeError:
            self._root = os.path.curdir
        super().__init__(stream)


def _construct_include(loader: _IncludeLoader, node: yaml.Node) -> Any:
    filename = os.path.abspath(
        os.path.join(loader._root, loader.construct_scalar(node))
    )
    ext = os.path.splitext(filename)[1].lstrip(".")
    with open(filename, "r") as f:
        if ext in ("yaml", "yml"):
            return yaml.load(f, _IncludeLoader)
        if ext == "json":
            return json.load(f)
        return f.read()


_IncludeLoader.add_constructor("!include", _construct_include)


@dataclass(frozen=True)
class Config:
    """Flat config covering the full reference YAML key set
    (`configs/sportspose-gt-kasportsformer.yaml:1-93`), plus TPU-native keys
    (mesh/dtype/kernels) that have no reference counterpart."""

    # --- checkpoint load (reference keys, group 1) ---
    checkpoint: bool = False
    resume: bool = False
    checkpoint_dir: str = "checkpoints/saved_checkpoint"
    checkpoint_file_name: str = ""
    resume_checkpoint_dir: str = "checkpoints/resume_checkpoint"
    resume_checkpoint_name: str = "resume.pth"

    # --- evaluate ---
    eval_only: bool = False
    evaluate_checkpoint_file_dir: str = "checkpoints/evaluate_checkpoint"
    evaluate_checkpoint_file: str = ""

    # --- training ---
    seed: int = 114514
    new_checkpoint_dir: str = "checkpoints/new_checkpoint"
    new_checkpoint_name: str = "new_ckp"
    epochs: int = 800
    learning_rate: float = 5e-4
    weight_decay: float = 0.01
    learning_rate_decay: float = 0.9
    warmup: bool = True
    warmup_epoches: int = 10  # (sic) reference spelling is part of the schema
    training_epoch_patience: int = 20
    # TPU addition (not in the reference schema): save the latest/best
    # checkpoints only every N epochs (0 disables saving entirely). The
    # reference saves every epoch (`train_and_evaluate_sp.py:350-358`);
    # through a remote-TPU tunnel each ~350 MB params+optimizer fetch costs
    # ~15 s, which can dwarf the epoch itself on small clip sets.
    checkpoint_interval: int = 1

    # --- loss lambdas ---
    lambda_mpjpe_velocity: float = 20.0
    lambda_n_mpjpe: float = 0.5
    lambda_limb_len_var: float = 0.0
    lambda_limb_len: float = 0.0
    lambda_limb_cos_simi: float = 0.0
    lambda_limb_cos_simi_velocity: float = 0.0

    # --- wandb ---
    use_wandb: bool = False
    wandb_name: str = "kasportsformer-tpu"
    wandb_project_name: str = "kasportsformer-tpu"
    wandb_api_key: str = ""  # never store real keys in configs
    wandb_run_id: str = ""

    # --- logging ---
    logger_dir_path: str = "./loggings"
    logger_file_name: str = "run.log"

    # --- dataset ---
    data_root: str = "./data/clips/"
    flip: bool = True
    clip_set_name: str = "SPgt-27"
    source_file_path: str = ""
    input_channel_number: int = 3
    dataset: str = "sportspose"  # new: 'sportspose' | 'worldpose'

    # --- dataloader ---
    batch_size: int = 32
    num_cpus: int = 8
    pin_memory: bool = True
    persistent_workers: bool = True
    num_joints: int = 17
    n_frames: int = 27

    # --- model ---
    model_name: str = "KASportsFormer"
    n_layers: int = 26
    dim_in: int = 3
    dim_feat: int = 128
    dim_rep: int = 512
    dim_out: int = 3
    mlp_ratio: float = 4.0
    act_layer: str = "gelu"
    attn_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-5
    use_adaptive_fusion: bool = True
    num_heads: int = 8
    qkv_bias: bool = False
    qkv_scale: float | None = None
    hierarchical: bool = False
    use_temporal_similarity: bool = True
    neighbour_num: int = 4
    temporal_connection_len: int = 1
    use_tcn: bool = False
    graph_only: bool = False

    # --- TPU-native extensions (absent from the reference schema) ---
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' for activations
    matmul_precision: str = ""  # ''|'default'|'high'|'highest'; 'highest'
    #   forces true-f32 matmuls on TPU (else f32 uses bf16x3 passes, ~1e-2
    #   absolute deviation on attention outputs) — set for strict CPU/torch
    #   parity checks on TPU
    mesh_data: int = -1  # data-parallel axis size; -1 = all devices
    mesh_model: int = 1  # tensor-parallel axis size
    use_pallas: bool = True  # use Pallas kernels where available (TPU only)
    eval_batch_size: int = 128  # measured single-chip throughput sweet
    # spot (docs/ROUND_NOTES.md); batching never changes eval results
    # (per-clip metrics, padded remainder masked). 0 = use batch_size.
    grad_microbatch: int = 32  # >0: accumulate gradients over microbatches
    # of this size inside the one jitted step (weighted-mean equivalent to
    # the full-batch gradient). Shrinks live activation memory per backward
    # so VMEM-resident fusions stop spilling: 32 is the measured v5e sweet
    # spot (281 vs 243 clips/s full-batch at batch 128; 283 at batch 256 —
    # docs/ROUND_NOTES.md round-3 session 4). GCN batch-norm statistics are
    # then per-microbatch — the same semantics as the reference's
    # DataParallel per-replica stats (see layers.batch_norm_nodes). 0 = off;
    # batches not divisible by the microbatch fall back to full-batch.

    # populated by the loader
    config_name: str = ""

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


_FIELDS = {f.name: f for f in dataclasses.fields(Config)}


def _coerce(name: str, value: Any) -> Any:
    f = _FIELDS[name]
    if value is None:
        return None if name == "qkv_scale" else _FIELDS[name].default
    if f.type in ("bool", bool):
        if isinstance(value, str):
            return value.strip().lower() in ("true", "1", "yes")
        return bool(value)
    if f.type in ("int", int):
        return int(value)
    if f.type in ("float", float):
        return float(value)
    if f.type in ("float | None",):
        return None if value is None else float(value)
    if f.type in ("str", str):
        return str(value)
    return value


def from_dict(raw: dict[str, Any], config_name: str = "") -> Config:
    """Build a Config from a raw dict, warning on unknown keys."""
    kwargs: dict[str, Any] = {}
    for key, value in raw.items():
        if key in _FIELDS:
            kwargs[key] = _coerce(key, value)
        else:
            log.warning("config: ignoring unknown key %r", key)
    if config_name:
        kwargs["config_name"] = config_name
    cfg = Config(**kwargs)
    # infer dataset family from the clip-set / config name when not explicit
    if "dataset" not in raw:
        hint = (cfg.clip_set_name + cfg.config_name).lower()
        if hint.startswith("wp") or "worldpose" in hint:
            cfg = cfg.replace(dataset="worldpose")
    return cfg


def load_config(path: str) -> Config:
    """Load a YAML config file (reference schema or extended), setting
    `config_name` from the filename like `utils/utilities.py:52-60`."""
    with open(path, "r", encoding="utf-8") as stream:
        raw = yaml.load(stream, Loader=_IncludeLoader) or {}
    config_name = os.path.splitext(os.path.basename(path))[0]
    return from_dict(raw, config_name=config_name)
