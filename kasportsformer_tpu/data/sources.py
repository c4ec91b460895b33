"""Source-dataset readers: SportsPose and WorldPose monolithic pickles.

Covers what the reference implements in `data/reader/sp_reader.py` and
`data/reader/wp_reader.py`: [-1,1] screen-coordinate normalization per
camera, clip splitting over video boundaries, and assembly of train/test
dicts (incl. 2.5D factors and scaled labels for the test protocol).

TPU-first differences:
* normalization is vectorized over all frames with per-camera masks instead
  of the reference's per-frame Python loops (`sp_reader.py:29-44`) — same
  float32 arithmetic, orders of magnitude faster on large sources;
* `resample` supports a deterministic mode (`randomness=False`) used by our
  preprocessing CLI by default so clip sets are reproducible; the randomized
  variant is kept for recipe parity.

Source pickle schema (both datasets): a dict with 'train'/'test' splits, each
holding 'joint_2d' (N,17,2), 'joint3d_image' (N,17,3), 'source' (N,) video
ids, 'camera_name' (N,), 'action' (N,), '2.5d_factor' (N,),
'joints_2.5d_image' (N,17,3), optional 'confidence' (N,17[,1]).
"""

from __future__ import annotations

import pickle
from typing import Any, Sequence

import numpy as np

# Per-camera resolutions: SportsPose (`sp_reader.py:30-34`), WorldPose fixed
# (`wp_reader.py:28`).
SPORTSPOSE_CAMERA_RES = {"outdoors": (1312, 1216), "indoors": (1216, 1936)}
WORLDPOSE_RES = (1920, 1080)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def resolution_table(camera_names: Sequence[str],
                     camera_res: dict[str, tuple[int, int]] | None,
                     fixed_res: tuple[int, int] | None) -> np.ndarray:
    """(N, 2) array of (res_w, res_h) per frame."""
    n = len(camera_names)
    if fixed_res is not None:
        return np.tile(np.array(fixed_res, np.float64), (n, 1))
    out = np.zeros((n, 2), np.float64)
    names = np.asarray(camera_names)
    matched = np.zeros(n, bool)
    for cam, (w, h) in camera_res.items():
        mask = names == cam
        out[mask] = (w, h)
        matched |= mask
    if not matched.all():
        bad = names[~matched][:5]
        raise ValueError(f"invalid camera name(s): {bad}")
    return out


def normalize_2d(xy: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Map pixel xy to [-1, 1]: x/res_w*2 - 1, y/res_w*2 - res_h/res_w
    (`sp_reader.py:36`), vectorized over frames. xy: (N,17,2), res: (N,2)."""
    res_w = res[:, 0:1, None]
    res_h = res[:, 1:2, None]
    offset = np.concatenate([np.ones_like(res_w), res_h / res_w], axis=-1)
    return (xy / res_w * 2 - offset).astype(np.float32)


def normalize_3d(xyz: np.ndarray, res: np.ndarray) -> np.ndarray:
    """xy as normalize_2d; z scaled by 2/res_w (`sp_reader.py:73-74`)."""
    out = np.empty_like(xyz, dtype=np.float32)
    out[..., :2] = normalize_2d(xyz[..., :2], res)
    out[..., 2:] = (xyz[..., 2:] / res[:, 0:1, None] * 2).astype(np.float32)
    return out


def denormalize(data: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Inverse of normalize_3d per clip: data (N,T,17,3), res (N,2)
    (`sp_reader.py:251-265`, `train_and_evaluate_sp.py:65-66`)."""
    res_w = res[:, 0, None, None, None]
    res_h = res[:, 1, None, None, None]
    out = np.empty_like(data)
    out[..., 0:1] = (data[..., 0:1] + 1.0) * res_w / 2
    out[..., 1:2] = (data[..., 1:2] + res_h / res_w) * res_w / 2
    out[..., 2:] = data[..., 2:] * res_w / 2
    return out


def resample(ori_len: int, target_len: int, rng: np.random.Generator | None = None,
             randomness: bool = True) -> np.ndarray:
    """Index map stretching/shrinking a segment to target_len
    (`sp_reader.py:147-169`, MotionBERT recipe).

    With `rng=None` and `randomness=True`, draws come from numpy's legacy
    global RNG with the same call pattern as the reference, so a shared
    `np.random.seed` reproduces the reference's exact clip boundaries."""
    even = np.linspace(0, ori_len, num=target_len, endpoint=False)
    if randomness:
        if ori_len < target_len:
            low = np.floor(even)
            high = np.ceil(even)
            sel = (rng.integers(0, 2, size=even.shape) if rng is not None
                   else np.random.randint(2, size=even.shape))
            result = np.sort(sel * low + (1 - sel) * high)
        else:
            interval = even[1] - even[0]
            noise = (rng.random(even.shape) if rng is not None
                     else np.random.random(even.shape))
            result = noise * interval + even
    else:
        result = even
    return np.clip(result, 0, ori_len - 1).astype(np.int64)


def split_clips(vid_list: Sequence, n_frames: int, data_stride: int,
                rng: np.random.Generator | None = None,
                randomness: bool = True) -> list[np.ndarray]:
    """MotionBERT-style clip splitting (`sp_reader.py:103-125`): slide a
    window of n_frames with stride data_stride inside each video; a video
    shorter than n_frames (or whose tail never filled a window) contributes
    one resampled clip."""
    result: list[np.ndarray] = []
    st = 0
    i = 0
    saved = set()
    n = len(vid_list)
    while i < n:
        i += 1
        if i - st == n_frames:
            result.append(np.arange(st, i))
            saved.add(vid_list[i - 1])
            st = st + data_stride
        if i == n:
            break
        if vid_list[i] != vid_list[i - 1]:
            if vid_list[i - 1] not in saved:
                result.append(resample(i - st, n_frames, rng, randomness) + st)
                saved.add(vid_list[i - 1])
            st = i
    return result


def split_clips_keep_tails(vid_list: Sequence, n_frames: int, data_stride: int,
                           rng: np.random.Generator | None = None,
                           randomness: bool = True) -> list[np.ndarray]:
    """WorldPose splitting (`wp_reader.py:95-111`, 'mysplit_clips'): windows
    restart at every video boundary, and a trailing segment of at least
    n_frames/2 is kept via resampling."""
    result: list[np.ndarray] = []
    start = 0
    i = 0
    n = len(vid_list)
    while i < n:
        if vid_list[i] != vid_list[start]:
            if (i - start) >= (n_frames / 2):
                result.append(resample(i - start, n_frames, rng, randomness) + start)
            start = i
            i -= 1
        else:
            if i - start + 1 == n_frames:
                result.append(np.arange(start, i + 1))
                start = start + data_stride
        i += 1
    return result


class PoseSourceReader:
    """Unified SP/WP source reader producing sliced train/test dicts
    (≙ `DataReaderSportsPose.get_sliced_data_sp`, `sp_reader.py:205-249`, and
    `DataReaderWorldPose.get_sliced_data_wp`, `wp_reader.py:161-199`)."""

    def __init__(self, source_file_path: str, dataset: str = "sportspose",
                 n_frames: int = 27, sample_stride: int = 1,
                 data_stride_train: int | None = None,
                 data_stride_test: int | None = None,
                 read_confidence: bool = True, seed: int | None = None,
                 randomness: bool = True):
        self.dataset = dataset.lower()
        if self.dataset not in ("sportspose", "worldpose"):
            raise ValueError(f"unknown dataset {dataset!r}")
        self.source = load_pickle(source_file_path)
        self.n_frames = n_frames
        self.sample_stride = sample_stride
        # reference CLI defaults: train stride n/3, test stride n
        # (`clip_generate_sp.py:98-100`)
        self.data_stride_train = data_stride_train or n_frames // 3
        self.data_stride_test = data_stride_test or n_frames
        self.read_confidence = read_confidence
        # seed=None -> legacy global np.random stream (reference-compatible)
        self.rng = np.random.default_rng(seed) if seed is not None else None
        self.randomness = randomness
        self._split_ids: tuple | None = None

    # -- helpers ---------------------------------------------------------
    def _res_for(self, split: str) -> np.ndarray:
        cams = self.source[split]["camera_name"]
        if self.dataset == "sportspose":
            res = resolution_table(cams, SPORTSPOSE_CAMERA_RES, None)
        else:
            res = resolution_table(cams if cams is not None else
                                   [""] * len(self.source[split]["source"]),
                                   None, WORLDPOSE_RES)
        return res[:: self.sample_stride]

    def _inputs(self, split: str, res: np.ndarray) -> np.ndarray:
        xy = self.source[split]["joint_2d"][:: self.sample_stride, :, :2].astype(np.float32)
        data = normalize_2d(xy, res)
        if self.read_confidence:
            conf = self.source[split].get("confidence")
            if conf is not None:
                conf = conf[:: self.sample_stride].astype(np.float32)
                if conf.ndim == 2:
                    conf = conf[:, :, None]
            else:
                conf = np.ones((*data.shape[:2], 1), np.float32)
            data = np.concatenate([data, conf], axis=2)
        return data

    def _labels(self, split: str, res: np.ndarray) -> np.ndarray:
        xyz = self.source[split]["joint3d_image"][:: self.sample_stride, :, :3].astype(np.float32)
        return normalize_3d(xyz, res)

    def split_ids(self) -> tuple[list[np.ndarray], list[np.ndarray]]:
        if self._split_ids is None:
            splitter = (split_clips if self.dataset == "sportspose"
                        else split_clips_keep_tails)
            train_vids = self.source["train"]["source"][:: self.sample_stride]
            test_vids = self.source["test"]["source"][:: self.sample_stride]
            self._split_ids = (
                splitter(train_vids, self.n_frames, self.data_stride_train,
                         self.rng, self.randomness),
                splitter(test_vids, self.n_frames, self.data_stride_test,
                         self.rng, self.randomness),
            )
        return self._split_ids

    @staticmethod
    def _gather(arr, ids: list[np.ndarray]) -> np.ndarray:
        return np.stack([np.asarray(arr)[idx] for idx in ids])

    # -- main ------------------------------------------------------------
    def get_sliced_data(self) -> tuple[dict, dict]:
        res_train = self._res_for("train")
        res_test = self._res_for("test")
        ids_train, ids_test = self.split_ids()

        train = {
            "data": self._gather(self._inputs("train", res_train), ids_train),
            "label": self._gather(self._labels("train", res_train), ids_train),
        }
        test = {
            "data": self._gather(self._inputs("test", res_test), ids_test),
            "label": self._gather(self._labels("test", res_test), ids_test),
            "action": self._gather(self.source["test"]["action"], ids_test),
            "factor": self._gather(self.source["test"]["2.5d_factor"], ids_test),
            "label_scaled": self._gather(
                self.source["test"]["joints_2.5d_image"], ids_test),
            "test_hw": self._gather(res_test, ids_test)[:, 0, :],
        }
        if self.dataset == "sportspose":
            test["envtag"] = self._gather(
                self.source["test"]["camera_name"], ids_test)
        return train, test
