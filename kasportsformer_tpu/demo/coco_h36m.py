"""COCO-17 -> H3.6M-17 keypoint conversion (≙ `demo/lib/preprocess.py`):
synthesizes head/thorax/pelvis/spine joints from COCO landmarks, remaps
confidence scores, and patches low-confidence leg joints."""

from __future__ import annotations

import numpy as np

H36M_FROM_COCO_ORDER = [9, 11, 14, 12, 15, 13, 16, 4, 1, 5, 2, 6, 3]
COCO_ORDER = [0, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
SYNTH_KEYPOINTS = [10, 8, 0, 7]  # head, thorax, pelvis, spine


def coco_to_h36m(keypoints: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(T, 17, 2) COCO keypoints -> (T, 17, 2) H36M keypoints + valid frame
    indices (`demo/lib/preprocess.py:10-37`)."""
    t = keypoints.shape[0]
    out = np.zeros_like(keypoints, dtype=np.float32)
    htps = np.zeros((t, 4, 2), dtype=np.float32)

    # head: x = mean of eyes+ears; y extrapolated above the nose
    htps[:, 0, 0] = np.mean(keypoints[:, 1:5, 0], axis=1, dtype=np.float32)
    htps[:, 0, 1] = (np.sum(keypoints[:, 1:3, 1], axis=1, dtype=np.float32)
                     - keypoints[:, 0, 1])
    # thorax: shoulder midpoint nudged 1/3 toward the nose
    htps[:, 1, :] = np.mean(keypoints[:, 5:7, :], axis=1, dtype=np.float32)
    htps[:, 1, :] += (keypoints[:, 0, :] - htps[:, 1, :]) / 3
    # pelvis: hip midpoint; spine: shoulders+hips centroid
    htps[:, 2, :] = np.mean(keypoints[:, 11:13, :], axis=1, dtype=np.float32)
    htps[:, 3, :] = np.mean(keypoints[:, [5, 6, 11, 12], :], axis=1,
                            dtype=np.float32)

    out[:, SYNTH_KEYPOINTS, :] = htps
    out[:, H36M_FROM_COCO_ORDER, :] = keypoints[:, COCO_ORDER, :]

    # refinements (`preprocess.py:27-31`)
    out[:, 9, :] -= (out[:, 9, :]
                     - np.mean(keypoints[:, 5:7, :], axis=1, dtype=np.float32)) / 4
    out[:, 7, 0] += 2 * (out[:, 7, 0]
                         - np.mean(out[:, [0, 8], 0], axis=1, dtype=np.float32))
    out[:, 8, 1] -= (np.mean(keypoints[:, 1:3, 1], axis=1, dtype=np.float32)
                     - keypoints[:, 0, 1]) * 2 / 3

    valid = np.where(np.sum(out.reshape(t, -1), axis=1) != 0)[0]
    return out, valid


def h36m_format(keypoints: np.ndarray, scores: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Batch conversion + score remap (`demo/lib/preprocess.py:40-69`).
    keypoints: (P, T, 17, 2) COCO, scores: (P, T, 17)."""
    assert keypoints.ndim == 4 and scores.ndim == 3
    kpts_out, scores_out, valid_out = [], [], []
    for person in range(keypoints.shape[0]):
        kpts = keypoints[person]
        score = scores[person]
        if np.sum(kpts) == 0.0:
            continue
        h36m, valid = coco_to_h36m(kpts)
        new_score = np.zeros_like(score, dtype=np.float32)
        new_score[:, H36M_FROM_COCO_ORDER] = score[:, COCO_ORDER]
        new_score[:, 0] = np.mean(score[:, [11, 12]], axis=1, dtype=np.float32)
        new_score[:, 8] = np.mean(score[:, [5, 6]], axis=1, dtype=np.float32)
        new_score[:, 7] = np.mean(new_score[:, [0, 8]], axis=1, dtype=np.float32)
        new_score[:, 10] = np.mean(score[:, [1, 2, 3, 4]], axis=1, dtype=np.float32)
        kpts_out.append(h36m)
        scores_out.append(new_score)
        valid_out.append(valid)
    return (np.asarray(kpts_out, np.float32), np.asarray(scores_out, np.float32),
            valid_out)


def revise_low_confidence(h36m_kpts: np.ndarray, h36m_scores: np.ndarray,
                          valid_frames: list[np.ndarray]) -> np.ndarray:
    """Substitute parent joints for low-confidence leg joints
    (`demo/lib/preprocess.py:72-103`)."""
    out = np.zeros_like(h36m_kpts)
    for index, frames in enumerate(valid_frames):
        kpts = h36m_kpts[index, frames]
        score = h36m_scores[index, frames]
        bad_frames = np.where(np.sum(score < 0.3, axis=1) > 0)[0]
        for frame in bad_frames:
            low = set(np.where(score[frame] < 0.3)[0].tolist())
            intersect = [i for i in (2, 3, 5, 6) if i in low]
            if intersect == [2, 3, 5, 6]:
                kpts[frame, [2, 3, 5, 6]] = kpts[frame, [1, 1, 4, 4]]
            elif intersect == [2, 3, 6]:
                kpts[frame, [2, 3, 6]] = kpts[frame, [1, 1, 5]]
            elif intersect == [3, 5, 6]:
                kpts[frame, [3, 5, 6]] = kpts[frame, [2, 4, 4]]
            elif intersect == [3, 6]:
                kpts[frame, [3, 6]] = kpts[frame, [2, 5]]
            elif intersect == [3]:
                kpts[frame, 3] = kpts[frame, 2]
            elif intersect == [6]:
                kpts[frame, 6] = kpts[frame, 5]
        out[index, frames] = kpts
    return out
