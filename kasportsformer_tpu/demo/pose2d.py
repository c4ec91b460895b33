"""Host-side 2D-pose support: affine crop geometry, patch preprocessing, and
heatmap decoding (≙ `demo/lib/hrnet/lib/utils/transforms.py`,
`utilitys.py:102-169`, `inference.py:21-82`). The HRNet forward itself runs
on TPU (see `demo/hrnet.py`); these stages are cheap per-frame cv2/numpy.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PIXEL_STD = 200.0


def _get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return [src_point[0] * cs - src_point[1] * sn,
            src_point[0] * sn + src_point[1] * cs]


def _get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def get_affine_transform(center, scale, rot, output_size,
                         shift=(0, 0), inv=False) -> np.ndarray:
    """(`transforms.py:58-90`)."""
    import cv2

    scale = np.array(scale) if not isinstance(scale, np.ndarray) else scale
    if scale.ndim == 0:
        scale = np.array([scale, scale])
    shift = np.array(shift, np.float32)
    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180
    src_dir = _get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale_tmp * shift
    src[1] = center + src_dir + scale_tmp * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2] = _get_3rd_point(src[0], src[1])
    dst[2] = _get_3rd_point(dst[0], dst[1])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def affine_transform(pt, t):
    return (t @ np.array([pt[0], pt[1], 1.0]))[:2]


def box_to_center_scale(box, model_image_width, model_image_height
                        ) -> tuple[np.ndarray, np.ndarray]:
    """bbox -> (center, scale) with aspect fitting and the 1.25 margin
    (`utilitys.py:102-134`). Note the reference passes image HEIGHT as
    model_image_width and vice versa at its call site — callers here pass
    the same arguments for behavioral parity."""
    center = np.zeros(2, np.float32)
    x1, y1, x2, y2 = box[:4]
    bw, bh = x2 - x1, y2 - y1
    center[0] = x1 + bw * 0.5
    center[1] = y1 + bh * 0.5
    aspect = model_image_width * 1.0 / model_image_height
    if bw > aspect * bh:
        bh = bw / aspect
    elif bw < aspect * bh:
        bw = bh * aspect
    scale = np.array([bw / PIXEL_STD, bh / PIXEL_STD], np.float32)
    if center[0] != -1:
        scale = scale * 1.25
    return center, scale


def preprocess_patches(image: np.ndarray, bboxes, image_size=(288, 384)
                       ) -> tuple[np.ndarray, list, list]:
    """Crop + resize person patches and ImageNet-normalize
    (`utilitys.py:138-169`). Returns (N, H, W, 3) float32 RGB-normalized
    patches (the reference flips BGR->RGB via channel indexing at
    `gen_kpts.py:154`), plus centers and scales for decode."""
    import cv2

    patches, centers, scales = [], [], []
    for bbox in bboxes:
        c, s = box_to_center_scale(bbox, image.shape[0], image.shape[1])
        centers.append(c)
        scales.append(s)
        trans = get_affine_transform(c, s, 0, image_size)
        patch = cv2.warpAffine(image, trans,
                               (int(image_size[0]), int(image_size[1])),
                               flags=cv2.INTER_LINEAR)
        patch = patch[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
        patch = (patch - IMAGENET_MEAN) / IMAGENET_STD
        patches.append(patch)
    return np.stack(patches), centers, scales


def get_max_preds(heatmaps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Argmax decode (`inference.py:21-49`): (B, J, H, W) -> coords (B,J,2),
    maxvals (B,J,1)."""
    b, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, j, -1)
    idx = np.argmax(flat, 2)
    maxvals = np.amax(flat, 2).reshape(b, j, 1)
    preds = np.tile(idx.reshape(b, j, 1), (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % w
    preds[:, :, 1] = np.floor(preds[:, :, 1] / w)
    preds *= np.tile(maxvals > 0.0, (1, 1, 2)).astype(np.float32)
    return preds, maxvals


def decode_heatmaps(heatmaps: np.ndarray, centers, scales,
                    post_process: bool = True
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Full decode: argmax + quarter-pixel gradient offset + inverse affine
    back to image space (`inference.py:52-82`)."""
    coords, maxvals = get_max_preds(heatmaps)
    hm_h, hm_w = heatmaps.shape[2], heatmaps.shape[3]
    if post_process:
        for n in range(coords.shape[0]):
            for p in range(coords.shape[1]):
                hm = heatmaps[n, p]
                px = int(np.floor(coords[n, p, 0] + 0.5))
                py = int(np.floor(coords[n, p, 1] + 0.5))
                if 1 < px < hm_w - 1 and 1 < py < hm_h - 1:
                    diff = np.array([hm[py][px + 1] - hm[py][px - 1],
                                     hm[py + 1][px] - hm[py - 1][px]])
                    coords[n, p] += np.sign(diff) * 0.25
    preds = coords.copy()
    for i in range(coords.shape[0]):
        trans = get_affine_transform(centers[i], scales[i], 0, [hm_w, hm_h],
                                     inv=True)
        for p in range(coords.shape[1]):
            preds[i, p, :2] = affine_transform(coords[i, p, :2], trans)
    return preds, maxvals
