"""Metrics: hand-computed values, invariance properties, and parity with the
reference numpy implementations."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from kasportsformer_tpu.train import metrics
from tests.conftest import REFERENCE_ROOT, reference_available

RNG = np.random.default_rng(42)


def _rand(shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_mpjpe_shape_and_value():
    p = np.zeros((27, 17, 3), np.float32)
    t = np.ones((27, 17, 3), np.float32)
    out = np.asarray(metrics.mpjpe(jnp.asarray(p), jnp.asarray(t)))
    assert out.shape == (27,)
    np.testing.assert_allclose(out, np.sqrt(3.0), rtol=1e-6)


def test_jpe_shape():
    p, t = _rand((27, 17, 3)), _rand((27, 17, 3))
    assert np.asarray(metrics.jpe(jnp.asarray(p), jnp.asarray(t))).shape == (27, 17)


def test_acceleration_error_linear_motion_is_zero():
    # linear motion has zero 2nd difference for both -> error 0
    base = _rand((1, 17, 3))
    vel = _rand((1, 17, 3))
    frames = base + vel * np.arange(27)[:, None, None]
    out = np.asarray(
        metrics.acceleration_error(jnp.asarray(frames + 0.5), jnp.asarray(frames))
    )
    assert out.shape == (25,)
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_p_mpjpe_invariant_under_rigid_transform_and_scale():
    t = _rand((27, 17, 3))
    # random rotation via QR
    q, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    p = 2.5 * t @ q.T + np.array([10.0, -3.0, 7.0])
    out = np.asarray(metrics.p_mpjpe(jnp.asarray(p.astype(np.float32)), jnp.asarray(t)))
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_p_mpjpe_handles_reflection():
    t = _rand((27, 17, 3))
    p = t.copy()
    p[..., 0] *= -1  # reflection: P-MPJPE must NOT be ~0 (det fix prevents it)
    out = np.asarray(metrics.p_mpjpe(jnp.asarray(p), jnp.asarray(t)))
    assert np.all(out > 1e-3)


def test_batched_clip_metrics_matches_single():
    p, t = _rand((4, 27, 17, 3)), _rand((4, 27, 17, 3))
    batched = metrics.batched_clip_metrics(jnp.asarray(p), jnp.asarray(t))
    single = metrics.clip_metrics(jnp.asarray(p[1]), jnp.asarray(t[1]))
    for key in ("mpjpe", "jpe", "acc_err", "p_mpjpe"):
        np.testing.assert_allclose(
            np.asarray(batched[key][1]), np.asarray(single[key]), rtol=2e-5, atol=2e-5
        )


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_metrics_match_reference_numpy():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from utils import error_calc  # reference module

    p = _rand((27, 17, 3)).astype(np.float64)
    t = _rand((27, 17, 3)).astype(np.float64)

    np.testing.assert_allclose(
        np.asarray(metrics.mpjpe(jnp.asarray(p), jnp.asarray(t))),
        error_calc.mpjpe_calc(p, t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(metrics.jpe(jnp.asarray(p), jnp.asarray(t))),
        error_calc.jpe_calc(p, t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(metrics.acceleration_error(jnp.asarray(p), jnp.asarray(t))),
        error_calc.acc_error_calc(p, t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(metrics.p_mpjpe(jnp.asarray(p), jnp.asarray(t))),
        error_calc.p_mpjpe_calc(p, t), rtol=1e-4, atol=1e-5)


def test_joint_flip_involution():
    from kasportsformer_tpu.utils.common import joint_flip

    x = _rand((2, 27, 17, 3))
    flipped = joint_flip(jnp.asarray(x))
    back = np.asarray(joint_flip(flipped))
    np.testing.assert_allclose(back, x, rtol=1e-6)
    # numpy path agrees with jnp path
    np.testing.assert_allclose(joint_flip(x), np.asarray(flipped), rtol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_joint_flip_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.conftest import enable_reference_imports

    enable_reference_imports()
    from utils.utilities import joint_flip as ref_flip

    from kasportsformer_tpu.utils.common import joint_flip

    x = _rand((2, 27, 17, 3))
    want = ref_flip(torch.from_numpy(x.copy())).numpy()
    np.testing.assert_allclose(joint_flip(x), want, rtol=1e-6)
