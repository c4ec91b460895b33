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


def test_weighted_total_loss_limb_lambdas():
    """The train step's weighted loss with all-ones weights equals
    `losses.total_loss` term for term, including the limb family the
    reference ships commented out (`train_and_evaluate_sp.py:216-220`)."""
    from kasportsformer_tpu.train.loop import weighted_total_loss

    p = jnp.asarray(_rand((3, 27, 17, 3)))
    t = jnp.asarray(_rand((3, 27, 17, 3)))
    lambdas = dict(lambda_n_mpjpe=0.5, lambda_mpjpe_velocity=20.0,
                   lambda_limb_len_var=0.7, lambda_limb_len=1.3,
                   lambda_limb_cos_simi=0.2,
                   lambda_limb_cos_simi_velocity=0.4)
    w_total, w_comps = weighted_total_loss(p, t, jnp.ones(3), **lambdas)
    u_total, u_comps = losses.total_loss(p, t, **lambdas)
    assert set(w_comps) == set(u_comps)
    for k in u_comps:
        assert float(w_comps[k]) == pytest.approx(float(u_comps[k]), rel=1e-5), k

    # a nonzero limb lambda must change the objective
    base_total, base_comps = weighted_total_loss(
        p, t, jnp.ones(3), lambda_n_mpjpe=0.5, lambda_mpjpe_velocity=20.0)
    assert float(w_total) != pytest.approx(float(base_total), rel=1e-6)
    assert "loss_limb_len" not in base_comps


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_weighted_total_loss_matches_reference_commented_formula():
    """Compose the reference's full (commented-out) objective from
    `utils/loss_calc.py:30-94` in torch and compare."""
    torch = pytest.importorskip("torch")
    from tests.conftest import enable_reference_imports

    enable_reference_imports()
    from utils import loss_calc

    from kasportsformer_tpu.train.loop import weighted_total_loss

    p = _rand((2, 27, 17, 3))
    t = _rand((2, 27, 17, 3))
    tp, tt = torch.from_numpy(p), torch.from_numpy(t)
    lam = dict(lambda_n_mpjpe=0.5, lambda_mpjpe_velocity=20.0,
               lambda_limb_len_var=0.7, lambda_limb_len=1.3,
               lambda_limb_cos_simi=0.2, lambda_limb_cos_simi_velocity=0.4)
    want = (loss_calc.mpjpe_loss_calc(tp, tt)
            + lam["lambda_n_mpjpe"] * loss_calc.n_mpjpe_loss_calc(tp, tt)
            + lam["lambda_mpjpe_velocity"] * loss_calc.velocity_loss_calc(tp, tt)
            + lam["lambda_limb_len_var"] * loss_calc.loss_limb_var_calc(tp)
            + lam["lambda_limb_len"] * loss_calc.loss_limb_len_calc(tp, tt)
            + lam["lambda_limb_cos_simi"] * loss_calc.loss_cos_simi_calc(tp, tt)
            + lam["lambda_limb_cos_simi_velocity"]
            * loss_calc.loss_cos_simi_velocity_calc(tp, tt))
    got, _ = weighted_total_loss(jnp.asarray(p), jnp.asarray(t), jnp.ones(2), **lam)
    assert float(got) == pytest.approx(float(want), abs=5e-4)


def test_loss_gradients_finite_at_exact_zero_distance():
    """Resampled clips duplicate frames (`wp_reader.py:95-111`), which can
    make velocity differences bitwise zero; the loss gradients must follow
    torch.norm's subgradient-0 convention instead of NaN-ing the step."""
    import jax

    # pred == target on a whole frame -> zero mpjpe norm AND zero velocity
    t = jnp.asarray(_rand((2, 4, 17, 3)))
    p0 = t.at[0, 2:].add(0.25)  # frames 0-1 of clip 0 match target exactly

    lam = dict(lambda_n_mpjpe=0.5, lambda_mpjpe_velocity=20.0,
               lambda_limb_len_var=0.1, lambda_limb_len=0.1,
               lambda_limb_cos_simi=0.1, lambda_limb_cos_simi_velocity=0.1)

    def f(p):
        return losses.total_loss(p, t, **lam)[0]

    g = jax.grad(f)(p0)
    assert bool(jnp.isfinite(g).all()), "NaN gradient at exact-zero norms"

    # degenerate all-equal prediction (every bone zero-length)
    g2 = jax.grad(f)(jnp.ones_like(t))
    assert bool(jnp.isfinite(g2).all())
