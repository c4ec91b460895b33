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

    if "timm" not in sys.modules:
        import torch.nn as nn

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            """Stochastic depth; all reference configs use drop_path=0 so the
            identity stub is exact for parity testing."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                assert drop_prob in (0.0, None)

            def forward(self, x):
                return x

        timm_layers.DropPath = DropPath
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
