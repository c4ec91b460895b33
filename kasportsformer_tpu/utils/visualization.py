"""Offline qualitative visualization (≙ `utils/visualization.py`): run a
model over test clips, save predicted/ground-truth pairs, and render
prediction-vs-GT 3D overlays (prediction in blue, GT in gray).

TPU restructuring: predictions for the WHOLE clip set come from one batched
jitted sweep (the reference loads one pkl and runs one forward at a time);
rendering stays matplotlib on the host.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from kasportsformer_tpu.data.clips import ClipSet
from kasportsformer_tpu.data.pipeline import device_put_clipset, epoch_plan
from kasportsformer_tpu.skeleton import LIMB_PAIRS
from kasportsformer_tpu.train.evaluator import denormalize_device, tta_forward
from kasportsformer_tpu.utils.common import joint_flip  # noqa: F401 (re-export)

CONNECTIONS = [(b, a) for a, b in LIMB_PAIRS]


def generate_prediction_clips(model, params, state, clipset: ClipSet,
                              save_dir: str, batch_size: int = 128,
                              flip: bool = True) -> int:
    """Predict every test clip and save {predicted_result, ground_truth,
    action} pkls, 2.5D-scaled and root-centered like the eval protocol
    (≙ `visual_clip_generate`, reference `utils/visualization.py:50-117`)."""
    import jax
    import jax.numpy as jnp

    os.makedirs(save_dir, exist_ok=True)
    arrays = device_put_clipset(clipset)
    plan = epoch_plan(len(clipset), batch_size)

    @jax.jit
    def step(params, state, idx):
        x = jnp.take(arrays["inputs"], idx, axis=0)
        pred = tta_forward(model, params, state, x, flip)
        pred = pred.at[:, :, 0, :].set(0.0)
        pred = denormalize_device(pred, jnp.take(arrays["res"], idx, axis=0))
        pred = pred * jnp.take(arrays["factors"], idx, axis=0)[:, :, None, None]
        pred = pred - pred[:, :, 0:1, :]
        gt = jnp.take(arrays["labels_scaled"], idx, axis=0)
        gt = gt - gt[:, :, 0:1, :]
        return pred, gt

    count = 0
    for s in range(plan.steps):
        pred, gt = step(params, state, jnp.asarray(plan.indices[s]))
        pred, gt = np.asarray(pred), np.asarray(gt)
        for b in range(plan.batch_size):
            if plan.weights[s][b] == 0:
                continue
            clip_idx = int(plan.indices[s][b])
            payload = {
                "predicted_result": pred[b],
                "ground_truth": gt[b],
                "action": str(clipset.actions[clip_idx]),
            }
            with open(os.path.join(save_dir, "%08d.pkl" % clip_idx), "wb") as f:
                pickle.dump(payload, f)
            count += 1
    return count


def plot_comparison_figure(predicted: np.ndarray, ground_truth: np.ndarray,
                           save_path: str) -> None:
    """One frame's prediction (skyblue) over GT (gray)
    (≙ `plot_one_figure`, reference `utils/visualization.py:119-163`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    max_value = max(predicted.max(), ground_truth.max())
    min_value = min(predicted.min(), ground_truth.min())
    for a, b in CONNECTIONS:
        ax.plot(*[[ground_truth[a, d], ground_truth[b, d]] for d in range(3)],
                c="gray")
    for a, b in CONNECTIONS:
        ax.plot(*[[predicted[a, d], predicted[b, d]] for d in range(3)],
                c="skyblue")
    ax.scatter(predicted[:, 0], predicted[:, 1], predicted[:, 2],
               c="skyblue", s=8)
    ax.scatter(ground_truth[:, 0], ground_truth[:, 1], ground_truth[:, 2],
               c="gray", s=8)
    ax.set_xlim(min_value, max_value)
    ax.set_ylim(min_value, max_value)
    ax.set_zlim(min_value, max_value)
    plt.savefig(save_path)
    plt.close(fig)


def plot_prediction_clips(clip_dir: str, save_dir: str,
                          max_clips: int | None = None) -> int:
    """Render every saved prediction clip, one figure per frame
    (≙ `plot_one_clip` / `visualization_plot`)."""
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(clip_dir) if f.endswith(".pkl"))
    if max_clips is not None:
        files = files[:max_clips]
    n = 0
    for name in files:
        with open(os.path.join(clip_dir, name), "rb") as f:
            payload = pickle.load(f)
        stem = os.path.splitext(name)[0]
        for t in range(payload["predicted_result"].shape[0]):
            plot_comparison_figure(
                payload["predicted_result"][t], payload["ground_truth"][t],
                os.path.join(save_dir, f"{stem}_{t:03d}.png"))
            n += 1
    return n
