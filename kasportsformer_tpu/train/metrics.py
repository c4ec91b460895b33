"""Evaluation metrics (pure jnp, vmap/jit-friendly).

Functional rebuilds of the reference's numpy metrics (`utils/error_calc.py`),
written to run batched ON DEVICE: the reference loops clip-by-clip on the host
(`train_and_evaluate_sp.py:62-103`); here a whole batch of clips is reduced in
one jitted call (Procrustes SVD included) and only small per-frame metric
arrays come back to the host for per-action grouping.

Shapes: a clip is (T, 17, 3); batched inputs are (N, T, 17, 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-frame MPJPE (`utils/error_calc.py:5-7`): (T,17,3)->(T,)."""
    return jnp.mean(jnp.linalg.norm(predicted - target, axis=-1), axis=-1)


def jpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-frame per-joint position error (`utils/error_calc.py:10-12`):
    (T,17,3)->(T,17)."""
    return jnp.linalg.norm(predicted - target, axis=-1)


def acceleration_error(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-frame acceleration error (`utils/error_calc.py:15-19`):
    (T,17,3)->(T-2,). Second temporal difference, joint-mean."""
    acc_t = target[..., :-2, :, :] - 2 * target[..., 1:-1, :, :] + target[..., 2:, :, :]
    acc_p = (
        predicted[..., :-2, :, :]
        - 2 * predicted[..., 1:-1, :, :]
        + predicted[..., 2:, :, :]
    )
    return jnp.mean(jnp.linalg.norm(acc_p - acc_t, axis=-1), axis=-1)


def p_mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-frame Procrustes-aligned MPJPE (`utils/error_calc.py:21-48`):
    (T,17,3)->(T,).

    Per frame, finds the rigid transform + scale of `predicted` minimizing the
    error to `target` (orthogonal Procrustes via SVD, with the reflection fix),
    then reports MPJPE of the aligned prediction.
    """
    mu_x = jnp.mean(target, axis=1, keepdims=True)  # (T, 1, 3)
    mu_y = jnp.mean(predicted, axis=1, keepdims=True)
    x0 = target - mu_x
    y0 = predicted - mu_y
    norm_x = jnp.sqrt(jnp.sum(x0**2, axis=(1, 2), keepdims=True))
    norm_y = jnp.sqrt(jnp.sum(y0**2, axis=(1, 2), keepdims=True))
    x0 = x0 / norm_x
    y0 = y0 / norm_y

    h = jnp.matmul(jnp.swapaxes(x0, -2, -1), y0)  # (T, 3, 3)
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -2, -1)
    r = jnp.matmul(v, jnp.swapaxes(u, -2, -1))

    # Fix improper rotations (reflections): flip the sign of the smallest
    # singular vector when det(R) < 0.
    sign_det = jnp.sign(jnp.linalg.det(r))[:, None]  # (T, 1)
    v = v.at[:, :, -1].multiply(sign_det)
    s = s.at[:, -1].multiply(sign_det[:, 0])
    r = jnp.matmul(v, jnp.swapaxes(u, -2, -1))

    tr = jnp.sum(s, axis=1, keepdims=True)[:, :, None]  # (T, 1, 1)
    a = tr * norm_x / norm_y
    t = mu_x - a * jnp.matmul(mu_y, r)
    aligned = a * jnp.matmul(predicted, r) + t
    return jnp.mean(jnp.linalg.norm(aligned - target, axis=-1), axis=-1)


def clip_metrics(predicted: jnp.ndarray, target: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """All four eval metrics for one clip, as produced per clip in the
    reference eval loop (`train_and_evaluate_sp.py:74-81`)."""
    return {
        "mpjpe": mpjpe(predicted, target),
        "jpe": jpe(predicted, target),
        "acc_err": acceleration_error(predicted, target),
        "p_mpjpe": p_mpjpe(predicted, target),
    }


# Batched over the clip axis: (N, T, 17, 3) x 2 -> dict of (N, ...) arrays.
batched_clip_metrics = jax.vmap(clip_metrics)
