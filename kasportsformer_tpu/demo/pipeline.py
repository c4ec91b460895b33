"""Demo orchestrator (≙ `demo/demo.py:326-349`): the five stages
detect2d -> plot2d -> lift3d -> figure -> video, with the TPU-friendly
restructuring: video frames are detected and pose-estimated in BATCHES
through jitted YOLOv3/HRNet forwards (the reference runs one frame at a time,
`gen_kpts.py:117-172`); SORT tracking stays sequential on the host between
the two model stages.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from kasportsformer_tpu.demo import pose2d
from kasportsformer_tpu.demo.coco_h36m import h36m_format
from kasportsformer_tpu.demo.tracking import Sort


def read_video_frames(video_path: str) -> tuple[list[np.ndarray], dict]:
    import cv2

    cap = cv2.VideoCapture(video_path)
    meta = {
        "fps": int(cap.get(cv2.CAP_PROP_FPS)),
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
    }
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()
    return frames, meta


def gen_video_kpts(frames: list[np.ndarray], yolo_model, yolo_params,
                   hrnet_model, hrnet_params, hrnet_state,
                   det_dim: int = 416, num_person: int = 1,
                   confidence: float = 0.70, batch_size: int = 16
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(≙ `gen_kpts.py:99-180`): batched detection, host-side SORT, batched
    HRNet. Returns (P, T, 17, 2) COCO keypoints + (P, T, 17) scores."""
    import jax
    import jax.numpy as jnp

    from kasportsformer_tpu.demo.yolov3 import detect_humans_batched

    detections = detect_humans_batched(
        yolo_model, yolo_params, frames, confidence=confidence,
        batch_size=batch_size)

    # sequential tracking pass (host), like the reference's per-frame loop
    tracker = Sort(min_hits=0)
    frame_boxes: list[np.ndarray | None] = []
    prev = None
    for bboxes, scores in detections:
        if bboxes is None or not len(bboxes):
            bboxes = prev
        else:
            prev = bboxes
        if bboxes is None:
            frame_boxes.append(None)
            continue
        track = tracker.update(
            np.concatenate([bboxes, np.ones((len(bboxes), 1))], axis=1))
        if track.shape[0] == 0:
            frame_boxes.append(None)
            continue
        boxes = track[-num_person:, :4][::-1]
        frame_boxes.append(np.round(boxes, 2))

    # batched HRNet over all (frame, person) patches
    image_size = hrnet_model.cfg.image_size
    patches, centers, scales, owners = [], [], [], []
    for t, boxes in enumerate(frame_boxes):
        if boxes is None:
            continue
        pb, c, s = pose2d.preprocess_patches(frames[t], boxes, image_size)
        for k in range(len(pb)):
            patches.append(pb[k])
            centers.append(c[k])
            scales.append(s[k])
            owners.append((t, k))

    kpts = np.zeros((num_person, len(frames), 17, 2), np.float32)
    scores_out = np.zeros((num_person, len(frames), 17), np.float32)
    if patches:
        fwd = jax.jit(lambda p, s, v: hrnet_model.apply(p, s, v, train=False)[0])
        all_heatmaps = []
        for start in range(0, len(patches), batch_size):
            chunk = np.stack(patches[start:start + batch_size])
            chunk = chunk.transpose(0, 3, 1, 2)  # NHWC -> NCHW
            all_heatmaps.append(np.asarray(
                fwd(hrnet_params, hrnet_state, jnp.asarray(chunk))))
        heatmaps = np.concatenate(all_heatmaps, axis=0)
        preds, maxvals = pose2d.decode_heatmaps(heatmaps, centers, scales)
        for (t, k), kp, mv in zip(owners, preds, maxvals):
            if k < num_person:
                kpts[k, t] = kp
                scores_out[k, t] = mv[:, 0]
    return kpts, scores_out


def run_demo(video_path: str, output_dir: str, config_path: str,
             checkpoint_path: str, yolo_cfg: str, yolo_weights: str,
             hrnet_weights: str, elev: float = 5, azim: float = 5,
             num_person: int = 1, hrnet_cfg: str | None = None) -> None:
    """Full five-stage demo (`demo/demo.py:345-349`). `hrnet_cfg` optionally
    points at a reference yacs experiment yaml to select a non-w48 HRNet
    layout (≙ the reference's `--cfg` / `demo/lib/hrnet/lib/config`)."""
    import cv2
    import jax

    from kasportsformer_tpu.config import load_config
    from kasportsformer_tpu.demo.hrnet import (
        HRNet,
        hrnet_config_from_yaml,
        hrnet_state_dict_to_params,
    )
    from kasportsformer_tpu.demo.lifting import lift_keypoints
    from kasportsformer_tpu.demo.rendering import (
        compose_demo_figures,
        draw_2d_pose,
        save_3d_pose_figure,
        write_video,
    )
    from kasportsformer_tpu.demo.yolov3 import YoloV3
    from kasportsformer_tpu.models import build_model
    from kasportsformer_tpu.train import checkpoint as ckpt

    frames, meta = read_video_frames(video_path)
    os.makedirs(output_dir, exist_ok=True)

    # stage 1: 2D detection
    yolo = YoloV3(yolo_cfg)
    yolo_params = yolo.load_darknet_weights(yolo_weights)
    hcfg = hrnet_config_from_yaml(hrnet_cfg) if hrnet_cfg else None
    hrnet = HRNet(hcfg)
    import torch

    hrnet_sd = torch.load(hrnet_weights, map_location="cpu", weights_only=False)
    hrnet_params, hrnet_state = hrnet_state_dict_to_params(hrnet_sd, hcfg)
    kpts, scores = gen_video_kpts(frames, yolo, yolo_params, hrnet, hrnet_params,
                                  hrnet_state, num_person=num_person)
    kpts, scores, _ = h36m_format(kpts, scores)
    keypoints = np.concatenate([kpts, scores[..., None]], axis=-1)
    det_dir = os.path.join(output_dir, "detect2d")
    os.makedirs(det_dir, exist_ok=True)
    with open(os.path.join(det_dir, "keypoints2d.pkl"), "wb") as f:
        pickle.dump(keypoints, f)

    # stage 2: 2D overlays
    pose2d_dir = os.path.join(output_dir, "pose2d")
    os.makedirs(pose2d_dir, exist_ok=True)
    for i, frame in enumerate(frames):
        img = draw_2d_pose(keypoints[0, i], frame.copy())
        cv2.imwrite(os.path.join(pose2d_dir, "%04d_2D.png" % i), img)

    # stage 3: batched 3D lifting
    config = load_config(config_path)
    model = build_model(config)
    sd = ckpt.load_torch_checkpoint(checkpoint_path)
    params, state = ckpt.torch_state_dict_to_params(sd, config.n_layers)
    poses = lift_keypoints(model, params, state, keypoints,
                           meta["width"], meta["height"], config.n_frames)
    pose3d_dir = os.path.join(output_dir, "pose3d")
    os.makedirs(pose3d_dir, exist_ok=True)
    for i, pose in enumerate(poses):
        save_3d_pose_figure(pose, os.path.join(pose3d_dir, "%04d_3D.png" % i),
                            elev, azim)

    # stages 4-5: figures + video
    demo_dir = os.path.join(output_dir, "demo")
    compose_demo_figures(pose2d_dir, pose3d_dir, demo_dir)
    write_video(demo_dir, os.path.join(output_dir, "demo.mp4"),
                meta["fps"] + 5)
