"""YOLOv3 person detector in JAX (≙ `demo/lib/yolov3/`).

* `parse_darknet_cfg` reads a standard darknet .cfg into block dicts
  (≙ `darknet.py:38-67`);
* `YoloV3` builds a functional network from the blocks: conv(+BN+leaky),
  shortcut adds, route concats, nearest x2 upsample, and three YOLO heads
  decoded with sigmoid xy/obj/cls + anchor box transforms
  (≙ `darknet.py:266-346`, `util.py:34-82`);
* `load_darknet_weights` parses the official binary `.weights` format
  (≙ `darknet.py:348+`);
* `detect_humans` runs the whole batch of frames through ONE jitted forward
  (the reference detects frame-by-frame, `gen_kpts.py:117-125`), then does
  host-side confidence filtering + class-0 NMS + letterbox unscaling
  (≙ `util.py:107-226`, `human_detector.py:116-166`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ------------------------------------------------------------ cfg parsing


def parse_darknet_cfg(path: str) -> list[dict]:
    blocks: list[dict] = []
    block: dict = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("["):
                if block:
                    blocks.append(block)
                block = {"type": line[1:-1].rstrip()}
            else:
                key, value = line.split("=", 1)
                block[key.strip()] = value.strip()
    if block:
        blocks.append(block)
    return blocks


# ------------------------------------------------------------ model


class YoloV3:
    """Functional darknet network. `init_from_cfg` builds randomly
    initialized params (for tests); `load_darknet_weights` fills them from
    the released binary weights."""

    def __init__(self, cfg_path: str, input_dim: int | None = 416):
        self.blocks = parse_darknet_cfg(cfg_path)
        self.net_info = self.blocks[0]
        # the reference overrides the cfg's height with the runtime detection
        # resolution (`human_detector.py:101-103`); default 416
        self.input_dim = input_dim or int(self.net_info.get("height", 416))
        assert self.input_dim % 32 == 0 and self.input_dim > 32
        self._plan = self._build_plan()

    def _build_plan(self):
        """Static layer plan with channel bookkeeping."""
        plan = []
        channels = [3]
        for block in self.blocks[1:]:
            btype = block["type"]
            entry = {"type": btype, "block": block}
            if btype == "convolutional":
                entry["filters"] = int(block["filters"])
                entry["size"] = int(block["size"])
                entry["stride"] = int(block["stride"])
                entry["pad"] = (entry["size"] - 1) // 2 if int(block["pad"]) else 0
                entry["bn"] = int(block.get("batch_normalize", 0)) == 1
                entry["activation"] = block["activation"]
                entry["in_channels"] = channels[-1]
                channels.append(entry["filters"])
            elif btype == "shortcut":
                entry["from"] = int(block["from"])
                channels.append(channels[-1])
            elif btype == "route":
                layers = [int(v) for v in block["layers"].split(",")]
                idx = len(plan)
                layers = [l if l < 0 else l - idx for l in layers]
                entry["layers"] = layers
                channels.append(sum(channels[idx + l + 1] for l in layers))
            elif btype == "upsample":
                entry["stride"] = int(block["stride"])
                channels.append(channels[-1])
            elif btype == "yolo":
                mask = [int(v) for v in block["mask"].split(",")]
                anchors = [int(v) for v in block["anchors"].split(",")]
                anchors = [(anchors[2 * i], anchors[2 * i + 1]) for i in mask]
                entry["anchors"] = anchors
                entry["classes"] = int(block["classes"])
                channels.append(channels[-1])
            elif btype == "maxpool":
                entry["size"] = int(block["size"])
                entry["stride"] = int(block["stride"])
                channels.append(channels[-1])
            else:
                raise ValueError(f"unsupported darknet block {btype!r}")
            plan.append(entry)
        return plan

    def init_from_cfg(self, key: jax.Array) -> Params:
        params: list = []
        for entry in self._plan:
            if entry["type"] != "convolutional":
                params.append({})
                continue
            key, sub = jax.random.split(key)
            c_in, c_out, k = entry["in_channels"], entry["filters"], entry["size"]
            p: Params = {"w": 0.02 * jax.random.normal(
                sub, (c_out, c_in, k, k), jnp.float32)}
            if entry["bn"]:
                p["bn_scale"] = jnp.ones((c_out,), jnp.float32)
                p["bn_bias"] = jnp.zeros((c_out,), jnp.float32)
                p["bn_mean"] = jnp.zeros((c_out,), jnp.float32)
                p["bn_var"] = jnp.ones((c_out,), jnp.float32)
            else:
                p["b"] = jnp.zeros((c_out,), jnp.float32)
            params.append(p)
        return {"layers": params}

    def load_darknet_weights(self, path: str) -> Params:
        """Official binary format: (5,) int32 header then a flat float32
        stream; per conv block: [bn_bias, bn_scale, bn_mean, bn_var] or
        [conv_bias], then conv weights (OIHW order)."""
        with open(path, "rb") as f:
            np.fromfile(f, dtype=np.int32, count=5)  # header
            weights = np.fromfile(f, dtype=np.float32)
        ptr = 0
        params: list = []
        for entry in self._plan:
            if entry["type"] != "convolutional":
                params.append({})
                continue
            c_in, c_out, k = entry["in_channels"], entry["filters"], entry["size"]
            p: Params = {}
            if entry["bn"]:
                p["bn_bias"] = jnp.asarray(weights[ptr:ptr + c_out]); ptr += c_out
                p["bn_scale"] = jnp.asarray(weights[ptr:ptr + c_out]); ptr += c_out
                p["bn_mean"] = jnp.asarray(weights[ptr:ptr + c_out]); ptr += c_out
                p["bn_var"] = jnp.asarray(weights[ptr:ptr + c_out]); ptr += c_out
            else:
                p["b"] = jnp.asarray(weights[ptr:ptr + c_out]); ptr += c_out
            n = c_out * c_in * k * k
            p["w"] = jnp.asarray(weights[ptr:ptr + n].reshape(c_out, c_in, k, k))
            ptr += n
            params.append(p)
        if ptr != len(weights):
            raise ValueError(f"weight file mismatch: used {ptr} of {len(weights)}")
        return {"layers": params}

    # ----------------------------------------------------------- forward
    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 3, H, W) in [0,1] RGB -> (B, n_boxes, 5+classes) decoded
        detections in input-pixel space."""
        outputs: list[jnp.ndarray] = []
        detections = []
        for i, entry in enumerate(self._plan):
            btype = entry["type"]
            if btype == "convolutional":
                p = params["layers"][i]
                pad = entry["pad"]
                y = jax.lax.conv_general_dilated(
                    x, p["w"], (entry["stride"], entry["stride"]),
                    [(pad, pad), (pad, pad)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                if entry["bn"]:
                    inv = jax.lax.rsqrt(p["bn_var"] + 1e-5)
                    y = ((y - p["bn_mean"][None, :, None, None])
                         * (p["bn_scale"] * inv)[None, :, None, None]
                         + p["bn_bias"][None, :, None, None])
                else:
                    y = y + p["b"][None, :, None, None]
                if entry["activation"] == "leaky":
                    y = jax.nn.leaky_relu(y, 0.1)
                x = y
            elif btype == "shortcut":
                x = outputs[i - 1] + outputs[i + entry["from"]]
            elif btype == "route":
                maps = [outputs[i + l] for l in entry["layers"]]
                x = maps[0] if len(maps) == 1 else jnp.concatenate(maps, axis=1)
            elif btype == "upsample":
                s = entry["stride"]
                x = jnp.repeat(jnp.repeat(x, s, axis=2), s, axis=3)
            elif btype == "maxpool":
                k, s = entry["size"], entry["stride"]
                x = -jax.lax.reduce_window(
                    -x, jnp.inf, jax.lax.min, (1, 1, k, k), (1, 1, s, s),
                    "SAME" if s == 1 else "VALID")
            elif btype == "yolo":
                detections.append(self._decode_head(x, entry))
                x = outputs[i - 1]
            outputs.append(x)
        return jnp.concatenate(detections, axis=1)

    def _decode_head(self, x: jnp.ndarray, entry) -> jnp.ndarray:
        """(`util.py:34-82`): sigmoid xy/obj/cls, grid offsets, anchor scale."""
        b, _, g, _ = x.shape
        anchors = entry["anchors"]
        n_anchors = len(anchors)
        n_attrs = 5 + entry["classes"]
        stride = self.input_dim // g
        pred = x.reshape(b, n_anchors, n_attrs, g, g)
        pred = pred.transpose(0, 3, 4, 1, 2).reshape(b, g * g * n_anchors, n_attrs)
        gy, gx = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
        offsets = jnp.stack([gx, gy], -1).reshape(-1, 1, 2)
        offsets = jnp.tile(offsets, (1, n_anchors, 1)).reshape(1, -1, 2)
        anc = jnp.asarray(np.array(anchors, np.float32) / stride)
        anc = jnp.tile(anc[None], (g * g, 1, 1)).reshape(1, -1, 2)
        xy = (jax.nn.sigmoid(pred[..., :2]) + offsets) * stride
        wh = jnp.exp(pred[..., 2:4]) * anc * stride
        obj = jax.nn.sigmoid(pred[..., 4:5])
        cls = jax.nn.sigmoid(pred[..., 5:])
        return jnp.concatenate([xy, wh, obj, cls], axis=-1)


# ------------------------------------------------------------ host post


def letterbox(img: np.ndarray, inp_dim: int) -> np.ndarray:
    """Aspect-preserving resize onto a 128-gray canvas
    (`preprocess.py:9-22`)."""
    import cv2

    h, w = img.shape[:2]
    scale = min(inp_dim / w, inp_dim / h)
    new_w, new_h = int(w * scale), int(h * scale)
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    canvas = np.full((inp_dim, inp_dim, 3), 128, dtype=np.uint8)
    top = (inp_dim - new_h) // 2
    left = (inp_dim - new_w) // 2
    canvas[top:top + new_h, left:left + new_w] = resized
    return canvas


def _nms_class0(dets: np.ndarray, nms_thresh: float) -> np.ndarray:
    """Greedy NMS on person detections [(x1,y1,x2,y2,score), ...]."""
    order = np.argsort(-dets[:, 4])
    dets = dets[order]
    keep = []
    while len(dets):
        keep.append(dets[0])
        if len(dets) == 1:
            break
        xx1 = np.maximum(dets[0, 0], dets[1:, 0])
        yy1 = np.maximum(dets[0, 1], dets[1:, 1])
        xx2 = np.minimum(dets[0, 2], dets[1:, 2])
        yy2 = np.minimum(dets[0, 3], dets[1:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area0 = (dets[0, 2] - dets[0, 0]) * (dets[0, 3] - dets[0, 1])
        areas = (dets[1:, 2] - dets[1:, 0]) * (dets[1:, 3] - dets[1:, 1])
        iou = inter / (area0 + areas - inter)
        dets = dets[1:][iou < nms_thresh]
    return np.stack(keep) if keep else np.empty((0, 5))


def postprocess_humans(raw: np.ndarray, orig_w: int, orig_h: int,
                       inp_dim: int, confidence: float = 0.70,
                       nms_thresh: float = 0.4
                       ) -> tuple[np.ndarray | None, np.ndarray | None]:
    """One frame's raw head output -> person bboxes in original image pixels
    (`util.py:107-226` person path + `human_detector.py:141-166` unscale)."""
    mask = raw[:, 4] > confidence
    preds = raw[mask]
    if not len(preds):
        return None, None
    cls_idx = np.argmax(preds[:, 5:], axis=1)
    cls_score = preds[np.arange(len(preds)), 5 + cls_idx]
    person = cls_idx == 0
    preds, cls_score = preds[person], cls_score[person]
    if not len(preds):
        return None, None
    boxes = np.empty((len(preds), 5), np.float32)
    boxes[:, 0] = preds[:, 0] - preds[:, 2] / 2
    boxes[:, 1] = preds[:, 1] - preds[:, 3] / 2
    boxes[:, 2] = preds[:, 0] + preds[:, 2] / 2
    boxes[:, 3] = preds[:, 1] + preds[:, 3] / 2
    boxes[:, 4] = preds[:, 4]
    kept = _nms_class0(boxes, nms_thresh)
    if not len(kept):
        return None, None
    # undo letterbox
    scale = min(inp_dim / orig_w, inp_dim / orig_h)
    kept[:, [0, 2]] -= (inp_dim - scale * orig_w) / 2
    kept[:, [1, 3]] -= (inp_dim - scale * orig_h) / 2
    kept[:, :4] /= scale
    kept[:, [0, 2]] = np.clip(kept[:, [0, 2]], 0, orig_w)
    kept[:, [1, 3]] = np.clip(kept[:, [1, 3]], 0, orig_h)
    return kept[:, :4].round(2), kept[:, 4:5]


def detect_humans_batched(model: YoloV3, params: Params,
                          frames: list[np.ndarray], confidence: float = 0.70,
                          nms_thresh: float = 0.4, batch_size: int = 16):
    """Letterbox + ONE jitted forward per batch of frames, then per-frame
    host postprocessing. Returns a list of (bboxes, scores) per frame."""
    inp = model.input_dim
    fwd = jax.jit(model.apply)
    results = []
    for start in range(0, len(frames), batch_size):
        chunk = frames[start:start + batch_size]
        batch = np.stack([
            letterbox(f, inp)[:, :, ::-1].transpose(2, 0, 1) for f in chunk
        ]).astype(np.float32) / 255.0
        raw = np.asarray(fwd(params, jnp.asarray(batch)))
        for f, r in zip(chunk, raw):
            results.append(postprocess_humans(
                r, f.shape[1], f.shape[0], inp, confidence, nms_thresh))
    return results
