"""Training losses (pure jnp functions, jit/grad-safe).

Functional rebuilds of the reference's torch losses (`utils/loss_calc.py`):
same math, same reductions, no in-place ops, no asserts on traced values.
All take/return jnp arrays shaped (B, T, 17, 3) unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.skeleton import ANGLE_PAIRS, LIMB_PAIRS

_LIMB_A = np.array([p[0] for p in LIMB_PAIRS])
_LIMB_B = np.array([p[1] for p in LIMB_PAIRS])
_ANGLE_A = np.array([p[0] for p in ANGLE_PAIRS])
_ANGLE_B = np.array([p[1] for p in ANGLE_PAIRS])


def _safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm whose gradient at exactly 0 is 0 (torch.norm's subgradient
    convention) instead of NaN. Exact zeros do occur in training: resampled
    clips duplicate frames (`wp_reader.py:95-111`), which can make a
    velocity difference bitwise zero — `jnp.linalg.norm`'s d/dx = x/|x|
    would then poison every gradient in the step. Forward values are
    identical to jnp.linalg.norm."""
    sq = jnp.sum(x * x, axis=axis)
    # the guard keys on `sq <= 0` (not `sq > 0`) so a NaN input — for which
    # both comparisons are False — falls through to sqrt and PROPAGATES
    # instead of being silently masked to 0. A diverged model must produce a
    # NaN loss, not a zero one (round-4 campaign: a mid-training NaN turned
    # every subsequent epoch into loss == 0.0 exactly, a zombie run the
    # plateau scheduler happily kept scheduling).
    zero = sq <= 0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))

# Per-joint weights used by weighted MPJPE (`utils/loss_calc.py:108`).
WEIGHTED_MPJPE_W = np.array(
    [1, 1, 2.5, 2.5, 1, 2.5, 2.5, 1, 1, 1, 1.5, 1.5, 4, 4, 1.5, 4, 4],
    dtype=np.float32,
)


def mpjpe_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error (`utils/loss_calc.py:6-10`)."""
    return jnp.mean(_safe_norm(predict - target))


def n_mpjpe_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Scale-normalized MPJPE: rescale predict by the per-frame least-squares
    optimal scale before MPJPE (`utils/loss_calc.py:13-18`)."""
    norm_predict = jnp.mean(
        jnp.sum(predict**2, axis=3, keepdims=True), axis=2, keepdims=True
    )
    norm_target = jnp.mean(
        jnp.sum(target * predict, axis=3, keepdims=True), axis=2, keepdims=True
    )
    scale = norm_target / norm_predict
    return mpjpe_loss(scale * predict, target)


def velocity_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MPJPE of first temporal differences (`utils/loss_calc.py:21-27`).
    Returns 0 for T<=1 (static shape, so a Python-level branch is fine)."""
    if predict.shape[1] <= 1:
        return jnp.zeros((), dtype=predict.dtype)
    vel_p = predict[:, 1:] - predict[:, :-1]
    vel_t = target[:, 1:] - target[:, :-1]
    return jnp.mean(_safe_norm(vel_p - vel_t))


def limb_lengths(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 17, 3) -> (B, T, 16) bone lengths (`utils/loss_calc.py:30-42`)."""
    diffs = x[:, :, _LIMB_A, :] - x[:, :, _LIMB_B, :]
    return _safe_norm(diffs)


def limb_length_variance_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean temporal variance of bone lengths (`utils/loss_calc.py:45-51`).
    Matches torch.var's unbiased (ddof=1) default."""
    if x.shape[1] <= 1:
        return jnp.zeros((), dtype=x.dtype)
    lens = limb_lengths(x)
    return jnp.mean(jnp.var(lens, axis=1, ddof=1))


def limb_length_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 between predicted and target bone lengths (`utils/loss_calc.py:54-58`)."""
    return jnp.mean(jnp.abs(limb_lengths(predict) - limb_lengths(target)))


def limb_angles(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 17, 3) -> (B, T, 18) inter-bone angles in radians
    (`utils/loss_calc.py:61-78`)."""
    eps = 1e-7
    bones = x[:, :, _LIMB_A, :] - x[:, :, _LIMB_B, :]  # (B, T, 16, 3)
    a = bones[:, :, _ANGLE_A, :]
    b = bones[:, :, _ANGLE_B, :]
    # torch cosine_similarity clamps each norm below at eps=1e-8. The clamp
    # does NOT rescue the backward (0 * nan = nan), hence _safe_norm.
    na = jnp.maximum(_safe_norm(a), 1e-8)
    nb = jnp.maximum(_safe_norm(b), 1e-8)
    cos = jnp.sum(a * b, axis=-1) / (na * nb)
    return jnp.arccos(jnp.clip(cos, -1 + eps, 1 - eps))


def cos_similarity_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 between inter-bone angles (`utils/loss_calc.py:80-83`)."""
    return jnp.mean(jnp.abs(limb_angles(predict) - limb_angles(target)))


def cos_similarity_velocity_loss(
    predict: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """L1 between temporal differences of inter-bone angles
    (`utils/loss_calc.py:86-94`)."""
    if predict.shape[1] <= 1:
        return jnp.zeros((), dtype=predict.dtype)
    ap = limb_angles(predict)
    at = limb_angles(target)
    vp = ap[:, 1:] - ap[:, :-1]
    vt = at[:, 1:] - at[:, :-1]
    return jnp.mean(jnp.abs(vp - vt))


def weighted_2d_loss(
    predict: jnp.ndarray, target: jnp.ndarray, conf: jnp.ndarray
) -> jnp.ndarray:
    """Confidence-weighted 2D reprojection error (`utils/loss_calc.py:96-101`)."""
    diff = (predict[..., :2] - target[..., :2]) * conf
    return jnp.mean(_safe_norm(diff))


def weighted_mpjpe(
    predict: jnp.ndarray, target: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-joint weighted MPJPE (`utils/loss_calc.py:103-112`)."""
    if w is None:
        w = jnp.asarray(WEIGHTED_MPJPE_W)
    return jnp.mean(w * _safe_norm(predict - target))


def total_loss(
    predict: jnp.ndarray,
    target: jnp.ndarray,
    lambda_n_mpjpe: float,
    lambda_mpjpe_velocity: float,
    lambda_limb_len_var: float = 0.0,
    lambda_limb_len: float = 0.0,
    lambda_limb_cos_simi: float = 0.0,
    lambda_limb_cos_simi_velocity: float = 0.0,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """The reference's training objective (`train_and_evaluate_sp.py:212-222`)
    plus the limb family (lambdas default 0 in all shipped configs).
    Returns (total, components dict keyed like the reference's loss meters)."""
    l_mpjpe = mpjpe_loss(predict, target)
    l_n = n_mpjpe_loss(predict, target)
    l_vel = velocity_loss(predict, target)
    total = l_mpjpe + lambda_n_mpjpe * l_n + lambda_mpjpe_velocity * l_vel
    components = {
        "loss_mpjpe": l_mpjpe,
        "loss_n_mpjpe": l_n,
        "loss_velocity": l_vel,
    }
    if lambda_limb_len_var:
        components["loss_limb_len_var"] = limb_length_variance_loss(predict)
        total = total + lambda_limb_len_var * components["loss_limb_len_var"]
    if lambda_limb_len:
        components["loss_limb_len"] = limb_length_loss(predict, target)
        total = total + lambda_limb_len * components["loss_limb_len"]
    if lambda_limb_cos_simi:
        components["loss_limb_len_cos_simi"] = cos_similarity_loss(predict, target)
        total = total + lambda_limb_cos_simi * components["loss_limb_len_cos_simi"]
    if lambda_limb_cos_simi_velocity:
        components["loss_limb_len_cos_simi_velocity"] = cos_similarity_velocity_loss(
            predict, target
        )
        total = (
            total
            + lambda_limb_cos_simi_velocity
            * components["loss_limb_len_cos_simi_velocity"]
        )
    components["loss_total"] = total
    return total, components
