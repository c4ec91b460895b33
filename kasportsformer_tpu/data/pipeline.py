"""Device-resident input pipeline.

The reference feeds training through a multiprocess torch DataLoader that
re-reads one pickle per sample per epoch (`train_and_evaluate_sp.py:251-255`).
Clip tensors are tiny (27x17x3 floats ≈ 5.5 KB), so here the ENTIRE clip set
is placed in device HBM once and every batch is a fused on-device gather:

* `EpochPlan` precomputes an index matrix (steps, B) for one epoch — shuffled
  for train, sequential for eval — padded by wraparound with a 0/1 weight
  mask so every step has a static shape (XLA requirement) while partial-batch
  semantics (loss/metric means over real samples only) are preserved;
* the random horizontal flip augmentation (50% per sample, input+label
  flipped together — `sp_dataset.py:75-78`) runs INSIDE the jitted train
  step, keyed by `jax.random.fold_in(epoch_key, step)`, so augmentation
  costs nothing and is bitwise reproducible.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.data.clips import ClipSet
from kasportsformer_tpu.utils.common import joint_flip


@dataclasses.dataclass
class EpochPlan:
    """Static-shape batch schedule for one pass over n samples."""

    indices: np.ndarray  # (steps, batch) int32
    weights: np.ndarray  # (steps, batch) float32; 0 marks wraparound padding
    steps: int
    batch_size: int


def epoch_plan(n: int, batch_size: int, rng: np.random.Generator | None = None
               ) -> EpochPlan:
    """Shuffled (rng given) or sequential epoch plan with wraparound padding."""
    order = rng.permutation(n) if rng is not None else np.arange(n)
    steps = -(-n // batch_size)
    padded = steps * batch_size
    idx = np.resize(order, padded).astype(np.int32)
    weights = np.zeros(padded, np.float32)
    weights[:n] = 1.0
    return EpochPlan(
        indices=idx.reshape(steps, batch_size),
        weights=weights.reshape(steps, batch_size),
        steps=steps,
        batch_size=batch_size,
    )


def device_put_clipset(clipset: ClipSet, sharding=None) -> dict[str, jax.Array]:
    """Move a ClipSet's numeric arrays to device (optionally sharded over a
    mesh). String fields (actions/envtags) stay host-side."""
    out: dict[str, jax.Array] = {}
    for name in ("inputs", "labels", "labels_scaled", "factors", "res"):
        value = getattr(clipset, name)
        if value is not None:
            arr = jnp.asarray(value)
            out[name] = jax.device_put(arr, sharding) if sharding is not None else arr
    return out


def take_batch(array: jax.Array, idx: jnp.ndarray) -> jnp.ndarray:
    """On-device batch gather. Indices come from `epoch_plan` and are in
    bounds by construction, so the bounds check is elided
    ('promise_in_bounds' — jnp.take's default OOB mode fills with NaN, which
    both hides bugs and costs a clamp on TPU)."""
    return array.at[idx].get(mode="promise_in_bounds")


def gather_batch(arrays: dict[str, jax.Array], idx: jnp.ndarray,
                 fields: tuple[str, ...]) -> dict[str, jnp.ndarray]:
    """On-device batch assembly: one gather per field (fuses into the step)."""
    return {name: take_batch(arrays[name], idx) for name in fields}


def random_flip_batch(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample 50% horizontal flip of input AND label together
    (≙ `sp_dataset.py:75-78`), fully on device."""
    mask = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    mask_x = mask[:, None, None, None]
    return (
        jnp.where(mask_x, joint_flip(x), x),
        jnp.where(mask_x, joint_flip(y), y),
    )


def truncate_channels(x: jnp.ndarray, input_channel_number: int) -> jnp.ndarray:
    """Optional 2-channel mode: drop the confidence channel
    (≙ `sp_dataset.py:85-86`)."""
    if input_channel_number == 2:
        return x[..., :2]
    return x
