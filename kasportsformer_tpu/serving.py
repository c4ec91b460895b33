"""Minimal production serving layer (no reference counterpart — the task's
deployment surface).

A threaded HTTP server exposing the lifter with a fixed-shape jitted forward:
requests are padded to the compiled batch size (one XLA program, no
recompiles), lifted with the same eval-protocol semantics as the demo
(normalize -> optional flip-TTA -> root-zero), and returned as JSON.

Endpoints:
  GET  /healthz  -> {"status": "ok", "model": ..., "params": N}
  POST /lift     -> body {"keypoints": [T][17][2|3], "width": W, "height": H,
                          "world": bool?}  (T <= n_frames x max_clips)
                 -> {"poses": [T][17][3]}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class LiftService:
    """Wraps a model + params with a fixed-batch jitted TTA forward."""

    def __init__(self, model, params, state, n_frames: int = 27,
                 batch_size: int = 128, flip: bool = True):
        import jax
        import jax.numpy as jnp

        from kasportsformer_tpu.train.evaluator import tta_forward

        self.model = model
        self.params = params
        self.state = state
        self.n_frames = n_frames
        self.batch_size = batch_size
        self._lock = threading.Lock()  # one device program at a time

        @jax.jit
        def lift(params, state, x):
            pred = tta_forward(model, params, state, x, flip)
            return pred.at[:, :, 0, :].set(0.0)

        self._lift = lift
        self._jnp = jnp
        # warm the compile with the fixed shape
        dummy = jnp.zeros((batch_size, n_frames, 17, 3), jnp.float32)
        np.asarray(self._lift(params, state, dummy))

    def lift_sequence(self, keypoints: np.ndarray, width: int, height: int,
                      world: bool = False) -> np.ndarray:
        """(T, 17, 2|3) pixel keypoints -> (T, 17, 3) poses — root-relative
        camera space, or (world=True) world space grounded at z=0 and
        max-normalized like the demo renderer (`demo/demo.py:243-248`).
        The sequence is chunked into n_frames clips (tail stretched like the
        demo), padded to the compiled batch size, and lifted in one call per
        batch_size clips."""
        from kasportsformer_tpu.demo.camera import (
            DEMO_CAMERA_QUATERNION,
            camera_to_world,
            normalize_screen_coordinates,
        )
        from kasportsformer_tpu.demo.lifting import turn_into_clips

        keypoints = np.asarray(keypoints, np.float32)
        if keypoints.ndim != 3 or keypoints.shape[1] != 17:
            raise ValueError("keypoints must be (T, 17, 2|3)")
        if keypoints.shape[-1] == 2:
            conf = np.ones((*keypoints.shape[:2], 1), np.float32)
            keypoints = np.concatenate([keypoints, conf], axis=-1)

        clips, downsample = turn_into_clips(keypoints[None], self.n_frames)
        batch = np.concatenate(
            [normalize_screen_coordinates(c[0], width, height)[None]
             for c in clips]).astype(np.float32)

        outs = []
        with self._lock:
            for start in range(0, len(batch), self.batch_size):
                chunk = batch[start:start + self.batch_size]
                pad = self.batch_size - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)])
                out = np.asarray(self._lift(self.params, self.state,
                                            self._jnp.asarray(chunk)))
                outs.append(out[: len(batch[start:start + self.batch_size])])
        out = np.concatenate(outs)
        frames = [out[i] for i in range(len(out) - 1)]
        frames.append(out[-1][downsample])
        poses = np.concatenate(frames, axis=0)[: len(keypoints)]
        if world:
            poses = camera_to_world(poses, DEMO_CAMERA_QUATERNION, 0)
            poses[..., 2] -= poses[..., 2].min(axis=-1, keepdims=True)
            maxes = poses.reshape(poses.shape[0], -1).max(axis=1)
            poses = poses / maxes[:, None, None]
        return poses


def make_handler(service: LiftService, model_name: str, n_params: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": model_name,
                                 "params": n_params})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/lift":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                poses = service.lift_sequence(
                    np.asarray(req["keypoints"], np.float32),
                    int(req["width"]), int(req["height"]),
                    world=bool(req.get("world", False)))
                self._send(200, {"poses": poses.tolist()})
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(model, params, state, host: str = "127.0.0.1", port: int = 8000,
          n_frames: int = 27, batch_size: int = 128, flip: bool = True,
          model_name: str = "KASportsFormer") -> ThreadingHTTPServer:
    """Start the server (returns it; call .serve_forever() or use as a
    handle in tests)."""
    service = LiftService(model, params, state, n_frames, batch_size, flip)
    n_params = model.parameter_count(params)
    server = ThreadingHTTPServer((host, port),
                                 make_handler(service, model_name, n_params))
    return server
