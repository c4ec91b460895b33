"""Test harness setup.

Tests run on CPU with 8 virtual XLA devices so the data-parallel / sharding
paths are exercised without TPU hardware. Env vars must be set before jax is
first imported anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This container's sitecustomize registers a remote-TPU PJRT plugin and then
# force-sets jax_platforms at interpreter start, which overrides JAX_PLATFORMS.
# Re-pin to CPU here so tests never tunnel to the TPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Pin the per-call NaN-guard policy for the suite: on CPU the sdpa Pallas
# kernels never run (masked_sdpa dispatches to XLA), so the default "outer"
# policy's whole-forward fallback branch adds nothing but a second trace of
# every train/eval step — measured +26% suite wall on the train-step tests.
# The outer machinery itself (contextvar scoping, the one-cond fallback,
# underflow recovery) is covered explicitly by interpret-mode tests in
# test_ops.py, and percall is what "outer" degrades to at the kernel level.
os.environ.setdefault("KASF_ATTN_GUARD", "percall")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def enable_reference_imports() -> None:
    """Make `/root/reference` importable for behavioral-parity tests, stubbing
    the reference's dependencies that aren't baked into this image (easydict,
    timm's DropPath — identity at drop_path=0, which all configs use)."""
    import types

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError as e:
                    raise AttributeError(name) from e

            def __setattr__(self, name, value):
                self[name] = value

        easydict.EasyDict = EasyDict
        sys.modules["easydict"] = easydict

    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb_util = types.ModuleType("wandb.util")
        wandb_util.generate_id = lambda: "stub-id"
        wandb.util = wandb_util
        wandb.init = lambda *a, **k: None
        wandb.log = lambda *a, **k: None
        wandb.Settings = lambda *a, **k: None
        wandb.config = types.SimpleNamespace(update=lambda *a, **k: None)
        sys.modules["wandb"] = wandb
        sys.modules["wandb.util"] = wandb_util

    if "torchprofile" not in sys.modules:
        torchprofile = types.ModuleType("torchprofile")
        torchprofile.profile_macs = lambda *a, **k: 0
        sys.modules["torchprofile"] = torchprofile

    if "timm" not in sys.modules:
        import torch.nn as nn

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_helpers = types.ModuleType("timm.models.helpers")
        timm_registry = types.ModuleType("timm.models.registry")
        timm_data = types.ModuleType("timm.data")

        class DropPath(nn.Module):
            """Stochastic depth (timm semantics). Parity tests run models in
            eval mode, where DropPath is the identity; train mode reproduces
            per-sample residual dropping."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):
                import torch

                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                return x * mask / keep

        def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            import torch

            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        timm_layers.DropPath = DropPath
        timm_layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        timm_layers.trunc_normal_ = _trunc_normal_
        timm_helpers.load_pretrained = lambda *a, **k: None
        timm_registry.register_model = lambda fn: fn
        timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
        timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
        timm_models.layers = timm_layers
        timm_models.helpers = timm_helpers
        timm_models.registry = timm_registry
        timm.models = timm_models
        timm.data = timm_data
        timm.__path__ = []  # mark as package so 'from timm.data import ...' works
        timm_models.__path__ = []
        for name, mod in (("timm", timm), ("timm.models", timm_models),
                          ("timm.models.layers", timm_layers),
                          ("timm.models.helpers", timm_helpers),
                          ("timm.models.registry", timm_registry),
                          ("timm.data", timm_data)):
            sys.modules[name] = mod
