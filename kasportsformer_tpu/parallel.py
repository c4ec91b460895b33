"""Mesh / sharding layer — the framework's distributed backbone.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(`train_and_evaluate_sp.py:262-264`, SURVEY.md §2.7). The TPU-native design
replaces it with a 2-D `jax.sharding.Mesh` ('data', 'model'):

* batches are sharded over 'data' (the DP axis); loss/grad reductions become
  XLA all-reduces over ICI inserted by pjit's sharding propagation — no
  explicit NCCL-style collectives in user code;
* parameters are replicated by default (29M params fit everywhere), with
  optional tensor-parallel sharding of the attention-head and MLP-hidden
  dimensions over 'model' for the scale-out path the reference never had;
* multi-host (DCN) extends the same mesh via `jax.distributed.initialize`;
  single-host multi-chip needs no initialization at all.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_distributed_initialized = False

# Active tensor-parallel dispatch state: (mesh, pallas_interpret) while a
# `tensor_parallel(mesh)` context is open. Read at TRACE time by the
# attention core (`models/layers._sdpa_tokens`): under a >1-wide 'model'
# axis it routes to the shard_map'd kernel (`ops/attention.masked_sdpa_tp`)
# so each chip runs on its local head shard instead of XLA all-gathering
# q/k/v around the replicated-spec pallas_call.
_TP_STATE: list[tuple[Mesh, bool]] = []


@contextlib.contextmanager
def tensor_parallel(mesh: Mesh | None, pallas_interpret: bool = False):
    """Enable mesh-aware tensor-parallel attention dispatch for everything
    traced inside. No-op when `mesh` is None or its 'model' axis is 1, so
    callers can wrap unconditionally. Must be open around the call that
    TRACES the jitted step (tracing happens on first call); an already-
    compiled program is unaffected, like every trace-time knob
    (docs/KNOBS.md). `pallas_interpret` forces the in-shard Pallas kernel
    into interpret mode — CPU-mesh testing of the real TP x kernel path."""
    if mesh is None or dict(mesh.shape).get(MODEL_AXIS, 1) == 1:
        yield
        return
    _TP_STATE.append((mesh, pallas_interpret))
    try:
        yield
    finally:
        _TP_STATE.pop()


def active_tp() -> tuple[Mesh, bool] | None:
    """The innermost open `tensor_parallel` context, if any."""
    return _TP_STATE[-1] if _TP_STATE else None


def maybe_init_distributed(enable: bool | None = None, **kwargs) -> bool:
    """Multi-host (DCN) entry point (SURVEY §5.8).

    Call BEFORE any mesh construction. `enable=None` reads the
    `KASF_DISTRIBUTED` env var (unset/0/false -> off), so pod launchers can
    turn it on without CLI plumbing; the CLI's `--distributed` flag passes
    True explicitly. When on, delegates to `jax.distributed.initialize`,
    which on TPU pods auto-discovers the coordinator from the TPU metadata
    (kwargs pass through for manual coordinator_address/num_processes/
    process_id setups). Single-host runs need no initialization — this is a
    no-op unless enabled. Returns whether initialize() was called."""
    global _distributed_initialized
    if enable is None:
        enable = os.environ.get("KASF_DISTRIBUTED", "").lower() not in (
            "", "0", "false")
    if not enable or _distributed_initialized:
        return False
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return True


def make_mesh(data: int = -1, model: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 fills with all remaining
    devices. Layout follows device order, so on a TPU slice the 'model' axis
    (if used) maps to nearest-neighbor ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    mesh_devices = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch / clip axis) over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_path(path: tuple, leaf) -> P:
    """Tensor-parallel PartitionSpecs for KASportsFormer parameter leaves.

    Trunk ('layers') leaves carry a leading scan axis. TP shards the
    contraction-free output dims of qkv/kv/q and mlp.fc1 and the input dims
    of proj/mlp.fc2 over 'model' — the Megatron split: an attention block or
    MLP needs only one all-reduce at its output projection, which XLA inserts
    automatically from these specs.
    """
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    ndim = getattr(leaf, "ndim", 0)

    def spec(*tail):
        lead = (None,) * (ndim - len(tail))
        return P(*lead, *tail)

    if "mixer" in keys and keys[-1] == "w":
        owner = keys[keys.index("mixer") + 1] if keys.index("mixer") + 1 < len(keys) else None
        if owner in ("qkv", "kv", "q"):
            return spec(None, MODEL_AXIS)  # (.., C, kC) -> shard heads dim
        if owner == "proj":
            return spec(MODEL_AXIS, None)  # row-parallel back
    if "mlp" in keys and keys[-1] == "w":
        owner = keys[keys.index("mlp") + 1] if keys.index("mlp") + 1 < len(keys) else None
        if owner == "fc1":
            return spec(None, MODEL_AXIS)
        if owner == "fc2":
            return spec(MODEL_AXIS, None)
    if "mlp" in keys and keys[-1] == "b":
        owner = keys[keys.index("mlp") + 1] if keys.index("mlp") + 1 < len(keys) else None
        if owner == "fc1":
            return spec(MODEL_AXIS)
    return P()  # replicate everything else


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding pytree for a parameter pytree. With tensor_parallel=False
    (or a 1-wide 'model' axis) everything is replicated."""
    if not tensor_parallel or mesh.shape[MODEL_AXIS] == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)), params)


def shard_pytree(tree: Any, shardings: Any) -> Any:
    return jax.tree.map(jax.device_put, tree, shardings)
