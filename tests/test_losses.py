"""Losses: golden-value checks against hand-computed values and the torch
reference implementations (when /root/reference is mounted)."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from kasportsformer_tpu.train import losses
from tests.conftest import REFERENCE_ROOT, reference_available

RNG = np.random.default_rng(0)


def _rand(shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_mpjpe_hand_value():
    p = np.zeros((1, 1, 17, 3), np.float32)
    t = np.zeros((1, 1, 17, 3), np.float32)
    t[..., 0] = 3.0
    t[..., 1] = 4.0  # every joint offset by a 3-4-5 triangle
    assert float(losses.mpjpe_loss(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(5.0)


def test_n_mpjpe_scale_invariance():
    t = _rand((2, 27, 17, 3))
    p = 3.7 * t  # perfectly correlated, wrong scale -> n_mpjpe == 0
    val = float(losses.n_mpjpe_loss(jnp.asarray(p), jnp.asarray(t)))
    assert val == pytest.approx(0.0, abs=1e-5)


def test_velocity_loss_zero_for_single_frame():
    p = _rand((2, 1, 17, 3))
    t = _rand((2, 1, 17, 3))
    assert float(losses.velocity_loss(jnp.asarray(p), jnp.asarray(t))) == 0.0


def test_velocity_loss_constant_offset_is_zero():
    t = _rand((2, 27, 17, 3))
    p = t + 1.25  # constant offset has zero velocity error
    assert float(losses.velocity_loss(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(
        0.0, abs=1e-5
    )


def test_limb_lengths_unit_skeleton():
    # place joint k at (k, 0, 0): every bone length = |child - parent| index gap
    x = np.zeros((1, 1, 17, 3), np.float32)
    x[0, 0, :, 0] = np.arange(17)
    lens = np.asarray(losses.limb_lengths(jnp.asarray(x)))[0, 0]
    expected = [abs(a - b) for a, b in zip(
        [0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15],
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16])]
    np.testing.assert_allclose(lens, expected, rtol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_losses_match_torch_reference():
    torch = pytest.importorskip("torch")
    from tests.conftest import enable_reference_imports

    enable_reference_imports()
    from utils import loss_calc  # reference module

    p = _rand((4, 27, 17, 3))
    t = _rand((4, 27, 17, 3))
    tp, tt = torch.from_numpy(p), torch.from_numpy(t)

    pairs = [
        (losses.mpjpe_loss, loss_calc.mpjpe_loss_calc),
        (losses.n_mpjpe_loss, loss_calc.n_mpjpe_loss_calc),
        (losses.velocity_loss, loss_calc.velocity_loss_calc),
        (losses.limb_length_loss, loss_calc.loss_limb_len_calc),
        (losses.cos_similarity_loss, loss_calc.loss_cos_simi_calc),
        (losses.cos_similarity_velocity_loss, loss_calc.loss_cos_simi_velocity_calc),
    ]
    for ours, ref in pairs:
        got = float(ours(jnp.asarray(p), jnp.asarray(t)))
        want = float(ref(tp, tt))
        assert got == pytest.approx(want, abs=2e-5), (ours.__name__, got, want)

    got = float(losses.limb_length_variance_loss(jnp.asarray(p)))
    want = float(loss_calc.loss_limb_var_calc(tp))
    assert got == pytest.approx(want, abs=2e-5)

    w = jnp.asarray(losses.WEIGHTED_MPJPE_W)
    got = float(losses.weighted_mpjpe(jnp.asarray(p), jnp.asarray(t), w))
    want = float(loss_calc.weighted_mpjpe(tp, tt, torch.from_numpy(np.asarray(w))))
    assert got == pytest.approx(want, abs=2e-5)


def test_total_loss_composition():
    p = _rand((2, 27, 17, 3))
    t = _rand((2, 27, 17, 3))
    total, comps = losses.total_loss(
        jnp.asarray(p), jnp.asarray(t), lambda_n_mpjpe=0.5, lambda_mpjpe_velocity=20.0
    )
    expected = (
        float(comps["loss_mpjpe"])
        + 0.5 * float(comps["loss_n_mpjpe"])
        + 20.0 * float(comps["loss_velocity"])
    )
    assert float(total) == pytest.approx(expected, rel=1e-6)
    assert float(comps["loss_total"]) == pytest.approx(expected, rel=1e-6)
