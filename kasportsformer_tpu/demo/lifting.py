"""3D lifting stage for the demo (≙ `demo/demo.py:132-258`).

The reference lifts one 27-frame clip per model call in a Python loop; here
every clip of the video is stacked into ONE batch and lifted in a single
jitted call (normalize + flip-TTA + root-zero on device), then the
camera-to-world transform and min-z grounding happen in vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from kasportsformer_tpu.demo.camera import (
    DEMO_CAMERA_QUATERNION,
    camera_to_world,
    normalize_screen_coordinates,
)
from kasportsformer_tpu.utils.common import joint_flip


def resample_indices(n_frames: int, target: int) -> np.ndarray:
    """Deterministic floor resample (`demo/demo.py:132-136`)."""
    even = np.linspace(0, n_frames, num=target, endpoint=False)
    return np.clip(np.floor(even), 0, n_frames - 1).astype(np.int64)


def turn_into_clips(keypoints: np.ndarray, target_len: int = 27
                    ) -> tuple[list[np.ndarray], np.ndarray]:
    """Chunk a (P, T, 17, C) keypoint track into fixed-length clips; a short
    tail (or short video) is stretched by resampling, and `downsample` maps
    the stretched clip back to its unique source frames
    (`demo/demo.py:139-156`)."""
    clips = []
    n_frames = keypoints.shape[1]
    downsample = np.arange(target_len)
    if n_frames <= target_len:
        idx = resample_indices(n_frames, target_len)
        clips.append(keypoints[:, idx])
        downsample = np.unique(idx, return_index=True)[1]
    else:
        for start in range(0, n_frames, target_len):
            chunk = keypoints[:, start:start + target_len]
            if chunk.shape[1] != target_len:
                idx = resample_indices(chunk.shape[1], target_len)
                clips.append(chunk[:, idx])
                downsample = np.unique(idx, return_index=True)[1]
            else:
                clips.append(chunk)
    return clips, downsample


def lift_keypoints(model, params, state, keypoints: np.ndarray,
                   frame_width: int, frame_height: int, n_frames: int = 27,
                   to_world: bool = True) -> np.ndarray:
    """(P=1, T, 17, 3) pixel keypoints+conf -> (T, 17, 3) world-space poses.

    One batched jit call for all clips (normalize -> flip-TTA forward ->
    root-zero), then camera->world + grounding + max-normalization as in
    `demo/demo.py:225-248`.
    """
    clips, downsample = turn_into_clips(keypoints, n_frames)
    batch = np.concatenate(
        [normalize_screen_coordinates(c[0], frame_width, frame_height)[None]
         for c in clips], axis=0).astype(np.float32)

    @jax.jit
    def lift(params, state, x):
        pred, _ = model.apply(params, state, x, train=False)
        pred_flip, _ = model.apply(params, state, joint_flip(x), train=False)
        pred = (pred + joint_flip(pred_flip)) / 2
        return pred.at[:, :, 0, :].set(0.0)

    out = np.asarray(lift(params, state, jnp.asarray(batch)))  # (N, F, 17, 3)
    # the last clip may have been stretched; keep only its unique source
    # frames (`demo/demo.py:236-237`; identity when nothing was resampled)
    frames = [out[i] for i in range(len(out) - 1)]
    frames.append(out[-1][downsample])
    poses = np.concatenate(frames, axis=0)  # (T', 17, 3)

    if to_world:
        poses = camera_to_world(poses, DEMO_CAMERA_QUATERNION, 0)
        # per frame: ground the lowest joint at z=0, normalize by the max
        # coordinate (`demo/demo.py:246-248`)
        poses[..., 2] -= poses[..., 2].min(axis=-1, keepdims=True)
        maxes = poses.reshape(poses.shape[0], -1).max(axis=1)
        poses = poses / maxes[:, None, None]
    return poses
