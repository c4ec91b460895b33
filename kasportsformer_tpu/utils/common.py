"""Observability + misc utilities.

TPU-native counterparts of the reference's `utils/utilities.py`: logger with
stream+timestamped-file handlers, running-average loss meter, deterministic
seeding (JAX PRNG keys instead of global RNG state), and the horizontal
pose-flip used for both train augmentation and eval TTA.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.skeleton import FLIP_PERM


def get_logger(dir_path: str, file_name: str, name: str = "kasportsformer_tpu"):
    """Stream + timestamped file logger (cf. `utils/utilities.py:67-88`)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    formatter = logging.Formatter(
        fmt="[%(asctime)s|%(filename)s|%(levelname)s] %(message)s",
        datefmt="%a %b %d %H:%M:%S %Y",
    )
    stream = logging.StreamHandler()
    stream.setFormatter(formatter)
    logger.addHandler(stream)

    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        time_str = time.strftime("%Y-%m-%d-%H.%M", time.localtime())
        fhandler = logging.FileHandler(
            os.path.join(dir_path, time_str + file_name), mode="w"
        )
        fhandler.setLevel(logging.DEBUG)
        fhandler.setFormatter(formatter)
        logger.addHandler(fhandler)
    logger.propagate = False
    return logger


class AverageMeter:
    """Running average of a scalar (cf. `utils/utilities.py:91-108`)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count


def seed_everything(seed: int) -> jax.Array:
    """Deterministic seeding. JAX PRNG is explicitly keyed, so unlike the
    reference (`utils/utilities.py:15-22`) there is no global torch/cudnn
    state to pin — numpy is seeded for host-side shuffles and a root key is
    returned for all on-device randomness."""
    np.random.seed(seed)
    return jax.random.key(seed)


def joint_flip(joints: jnp.ndarray) -> jnp.ndarray:
    """Mirror a pose horizontally: negate x, swap left/right joints.

    Functional version of `utils/utilities.py:128-135` (which mutates a deep
    copy in place): x-negation composed with a static joint permutation, so it
    stays a cheap fused gather under jit. Works on any (..., 17, C) array and
    is an involution.
    """
    if isinstance(joints, np.ndarray):
        flipped = joints.copy()
        flipped[..., 0] *= -1
        return flipped[..., FLIP_PERM, :]
    flipped = joints.at[..., 0].multiply(-1)
    return jnp.take(flipped, jnp.asarray(FLIP_PERM), axis=-2)


def chunked_batch_apply(fn, x: jnp.ndarray, chunk_size: int) -> jnp.ndarray:
    """Run `fn` over axis-0 chunks of `x` inside one jitted program.

    Large batches lose ~25% per-clip throughput on a v5e chip because the
    VMEM-resident fusions of the flagship forward spill above ~128 clips
    (measured round 2, docs/ROUND_NOTES.md); executing as a `lax.map` over
    sweet-spot-sized chunks keeps every chunk at peak per-clip cost while
    remaining a single dispatch. Inference-only by design: under `train=True`
    the GCN batch-norm computes batch statistics, and per-chunk execution
    would silently change them to per-chunk statistics.

    Falls back to one unchunked call when the batch is at or under
    `chunk_size`, when it does not divide evenly, or when chunking is
    disabled (chunk_size <= 0).

    Under the default "outer" NaN-guard policy the per-chunk `fn` is wrapped
    in `ops.attention.nan_guarded`: the sdpa kernels run unchecked and one
    isnan cond per chunk (instead of one per kernel call) re-runs the chunk
    through the stable kernels on underflow (docs/KNOBS.md).
    """
    from kasportsformer_tpu.ops.attention import nan_guarded

    fn = nan_guarded(fn)
    b = x.shape[0]
    if chunk_size <= 0 or b <= chunk_size or b % chunk_size:
        return fn(x)
    xs = x.reshape(b // chunk_size, chunk_size, *x.shape[1:])
    ys = jax.lax.map(fn, xs)
    return ys.reshape(b, *ys.shape[2:])
