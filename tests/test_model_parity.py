"""Forward parity: reference torch KASportsFormer vs the JAX rebuild.

The released checkpoints aren't mirrored in this environment, so parity is
established the stronger way: instantiate the reference model with its own
random initialization, convert that exact state_dict through our converter,
and require end-to-end and per-module forward deltas <= 1e-5 (f32).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import enable_reference_imports, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    enable_reference_imports()
    torch.manual_seed(0)
    from model.KASportsFormer import KASportsFormer as TorchKASF
    from model.KASportsFormer import bone_decomposer as torch_bone_decomposer

    model = TorchKASF(num_heads=8)  # public config uses 8 heads
    model.eval()
    return torch, model, torch_bone_decomposer


def test_bone_decomposer_parity(torch_ref):
    torch, _, torch_bd = torch_ref
    from kasportsformer_tpu.models.kasportsformer import bone_decomposer

    x = RNG.standard_normal((2, 27, 17, 3)).astype(np.float32)
    want = torch_bd(torch.from_numpy(x)).numpy()
    got = np.asarray(bone_decomposer(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_bone_decomposer_zero_length_guard():
    from kasportsformer_tpu.models.kasportsformer import bone_decomposer

    x = np.zeros((1, 1, 17, 3), np.float32)  # all bones zero-length
    out = np.asarray(bone_decomposer(jnp.asarray(x)))
    assert np.isfinite(out).all()
    # zero-length bones: direction 0/1 = 0, length channel = 1
    np.testing.assert_allclose(out[..., :16, 2], 1.0)


def test_param_count_matches_reference(torch_ref):
    _, model, _ = torch_ref
    from kasportsformer_tpu.models.kasportsformer import KASportsFormer

    want = sum(p.numel() for p in model.parameters() if p.requires_grad)
    jm = KASportsFormer()
    params, _ = jm.init(jax.random.key(0))
    assert jm.parameter_count(params) == want == 29365668


@pytest.fixture(scope="module")
def converted(torch_ref):
    _, model, _ = torch_ref
    from kasportsformer_tpu.train.checkpoint import torch_state_dict_to_params

    params, state = torch_state_dict_to_params(model.state_dict())
    return params, state


def test_bone_refusion_parity(torch_ref, converted):
    torch, model, _ = torch_ref
    from kasportsformer_tpu.models.kasportsformer import bone_refusion

    params, _ = converted
    x = RNG.standard_normal((2, 27, 17, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.bone_refusion(torch.from_numpy(x)).numpy()
    got = np.asarray(bone_refusion(params["bone_refusion"], jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_forward_parity_end_to_end(torch_ref, converted):
    torch, model, _ = torch_ref
    from kasportsformer_tpu.models.kasportsformer import KASportsFormer

    params, state = converted
    jm = KASportsFormer()
    x = RNG.standard_normal((2, 27, 17, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got, _ = jax.jit(lambda p, s, v: jm.apply(p, s, v, train=False))(
        params, state, jnp.asarray(x))
    got = np.asarray(got)
    assert got.shape == want.shape == (2, 27, 17, 3)
    delta = np.abs(got - want).max()
    assert delta <= 1e-5, f"forward delta {delta}"


def test_roundtrip_state_dict(converted):
    """params -> torch layout -> params is exact."""
    from kasportsformer_tpu.train.checkpoint import (
        params_to_torch_state_dict,
        torch_state_dict_to_params,
    )

    params, state = converted
    sd = params_to_torch_state_dict(params, state, module_prefix=True)
    assert all(k.startswith("module.") for k in sd)
    params2, state2 = torch_state_dict_to_params(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
