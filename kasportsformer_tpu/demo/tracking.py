"""SORT multi-object bbox tracker (≙ `demo/lib/sort/sort.py`) with a
self-contained Kalman filter (the reference depends on filterpy; same
constant-velocity [x, y, area, aspect] model and the same noise scalings).
Tracking stays host-side by design — it is sequential, branchy control flow;
detections arrive in batches from the TPU detector."""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def iou(bb_test: np.ndarray, bb_gt: np.ndarray) -> float:
    xx1 = max(bb_test[0], bb_gt[0])
    yy1 = max(bb_test[1], bb_gt[1])
    xx2 = min(bb_test[2], bb_gt[2])
    yy2 = min(bb_test[3], bb_gt[3])
    w = max(0.0, xx2 - xx1)
    h = max(0.0, yy2 - yy1)
    inter = w * h
    union = ((bb_test[2] - bb_test[0]) * (bb_test[3] - bb_test[1])
             + (bb_gt[2] - bb_gt[0]) * (bb_gt[3] - bb_gt[1]) - inter)
    return inter / union if union > 0 else 0.0


def bbox_to_z(bbox: np.ndarray) -> np.ndarray:
    """[x1,y1,x2,y2] -> [cx, cy, area, aspect]."""
    w = bbox[2] - bbox[0]
    h = bbox[3] - bbox[1]
    return np.array([bbox[0] + w / 2, bbox[1] + h / 2, w * h, w / float(h)])


def z_to_bbox(z: np.ndarray) -> np.ndarray:
    w = np.sqrt(z[2] * z[3])
    h = z[2] / w
    return np.array([z[0] - w / 2, z[1] - h / 2, z[0] + w / 2, z[1] + h / 2])


class _Kalman:
    """Linear Kalman filter with the SORT parameterization: 7-dim state
    [cx, cy, s, r, vcx, vcy, vs], 4-dim measurement."""

    def __init__(self, z0: np.ndarray):
        self.F = np.eye(7)
        self.F[0, 4] = self.F[1, 5] = self.F[2, 6] = 1.0
        self.H = np.zeros((4, 7))
        self.H[:4, :4] = np.eye(4)
        self.R = np.eye(4)
        self.R[2:, 2:] *= 10.0
        self.P = np.eye(7)
        self.P[4:, 4:] *= 1000.0
        self.P *= 10.0
        self.Q = np.eye(7)
        self.Q[-1, -1] *= 0.01
        self.Q[4:, 4:] *= 0.01
        self.x = np.zeros(7)
        self.x[:4] = z0

    def predict(self) -> None:
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z: np.ndarray) -> None:
        y = z - self.H @ self.x
        s = self.H @ self.P @ self.H.T + self.R
        k = self.P @ self.H.T @ np.linalg.inv(s)
        self.x = self.x + k @ y
        i_kh = np.eye(7) - k @ self.H
        # Joseph form for numerical stability (filterpy default update)
        self.P = i_kh @ self.P @ i_kh.T + k @ self.R @ k.T


class KalmanBoxTracker:
    count = 0

    def __init__(self, bbox: np.ndarray):
        self.kf = _Kalman(bbox_to_z(bbox))
        self.time_since_update = 0
        self.id = KalmanBoxTracker.count
        KalmanBoxTracker.count += 1
        self.hits = 0
        self.hit_streak = 0
        self.age = 0

    def update(self, bbox: np.ndarray) -> None:
        self.time_since_update = 0
        self.hits += 1
        self.hit_streak += 1
        self.kf.update(bbox_to_z(bbox))

    def predict(self) -> np.ndarray:
        if self.kf.x[6] + self.kf.x[2] <= 0:
            self.kf.x[6] = 0.0
        self.kf.predict()
        self.age += 1
        if self.time_since_update > 0:
            self.hit_streak = 0
        self.time_since_update += 1
        return z_to_bbox(self.kf.x)

    def get_state(self) -> np.ndarray:
        return z_to_bbox(self.kf.x)


def associate(detections: np.ndarray, trackers: np.ndarray,
              iou_threshold: float = 0.3):
    if len(trackers) == 0:
        return (np.empty((0, 2), int), np.arange(len(detections)),
                np.empty((0,), int))
    iou_matrix = np.array([[iou(d, t) for t in trackers] for d in detections],
                          np.float32).reshape(len(detections), len(trackers))
    rows, cols = linear_sum_assignment(-iou_matrix)
    matched = np.stack([rows, cols], axis=1)
    unmatched_d = [d for d in range(len(detections)) if d not in rows]
    unmatched_t = [t for t in range(len(trackers)) if t not in cols]
    matches = []
    for m in matched:
        if iou_matrix[m[0], m[1]] < iou_threshold:
            unmatched_d.append(m[0])
            unmatched_t.append(m[1])
        else:
            matches.append(m)
    matches = (np.stack(matches) if matches else np.empty((0, 2), int))
    return matches, np.array(unmatched_d), np.array(unmatched_t)


class Sort:
    """(`sort.py:177-223`); call update() once per frame."""

    def __init__(self, max_age: int = 1, min_hits: int = 3):
        self.max_age = max_age
        self.min_hits = min_hits
        self.trackers: list[KalmanBoxTracker] = []
        self.frame_count = 0

    def update(self, dets: np.ndarray) -> np.ndarray:
        """dets: (N, 5) [x1,y1,x2,y2,score] -> (M, 5) [x1,y1,x2,y2,track_id]."""
        self.frame_count += 1
        trks = np.zeros((len(self.trackers), 5))
        to_del = []
        for t in range(len(trks)):
            pos = self.trackers[t].predict()
            trks[t, :4] = pos
            if np.any(np.isnan(pos)):
                to_del.append(t)
        trks = trks[~np.isnan(trks).any(axis=1)]
        for t in reversed(to_del):
            self.trackers.pop(t)

        matched, unmatched_dets, unmatched_trks = associate(dets[:, :4], trks[:, :4])
        for t, trk in enumerate(self.trackers):
            if t not in unmatched_trks:
                d = matched[matched[:, 1] == t, 0]
                if len(d):
                    trk.update(dets[d[0], :4])
        for i in unmatched_dets:
            self.trackers.append(KalmanBoxTracker(dets[i, :4]))

        ret = []
        i = len(self.trackers)
        for trk in reversed(self.trackers):
            d = trk.get_state()
            if trk.time_since_update < 1 and (
                    trk.hit_streak >= self.min_hits
                    or self.frame_count <= self.min_hits):
                ret.append(np.concatenate([d, [trk.id + 1]]))
            i -= 1
            if trk.time_since_update > self.max_age:
                self.trackers.pop(i)
        return np.stack(ret) if ret else np.empty((0, 5))
