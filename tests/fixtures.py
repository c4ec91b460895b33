"""Synthetic source-pickle fixtures mimicking the SP/WP source schema
(SURVEY.md §2.5), small enough for fast tests but structurally faithful:
multiple videos, mixed cameras, per-video actions, 2.5D factors."""

import numpy as np


def make_source(dataset: str = "sportspose", with_confidence: bool = False,
                train_video_lens=(27, 36, 45), test_video_lens=(27, 54),
                seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    cameras = ["outdoors", "indoors"]
    actions = ["serve", "smash", "dive", "sprint"]

    def split(video_lens, offset):
        n = int(sum(video_lens))
        source, camera_name, action = [], [], []
        for v, length in enumerate(video_lens):
            vid = f"vid{offset + v}"
            source += [vid] * length
            camera_name += [cameras[(offset + v) % 2]] * length
            action += [actions[(offset + v) % len(actions)]] * length
        joint_2d = rng.uniform(0, 1200, size=(n, 17, 2)).astype(np.float32)
        joint3d = rng.uniform(-500, 1200, size=(n, 17, 3)).astype(np.float32)
        d = {
            "joint_2d": joint_2d,
            "joint3d_image": joint3d,
            "source": np.array(source),
            "camera_name": np.array(camera_name),
            "action": np.array(action),
            "2.5d_factor": rng.uniform(2, 6, size=(n,)).astype(np.float32),
            "joints_2.5d_image": rng.uniform(-2000, 2000, size=(n, 17, 3)).astype(np.float32),
        }
        if with_confidence:
            d["confidence"] = rng.uniform(0, 1, size=(n, 17)).astype(np.float32)
        return d

    src = {"train": split(train_video_lens, 0), "test": split(test_video_lens, 10)}
    if dataset == "worldpose":
        # WP ignores camera names (fixed 1920x1080)
        pass
    return src
