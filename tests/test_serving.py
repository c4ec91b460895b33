"""HTTP serving layer: health, lifting round trip, error handling,
fixed-batch padding, concurrency."""

import http.client
import json
import threading

import numpy as np
import pytest
import jax

from kasportsformer_tpu.models.kasportsformer import (
    KASportsFormer,
    KASportsFormerConfig,
)
from kasportsformer_tpu.serving import LiftService, serve

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def server():
    model = KASportsFormer(KASportsFormerConfig(n_layers=2, dim_feat=32,
                                                dim_rep=64, num_heads=4))
    params, state = model.init(jax.random.key(0))
    srv = serve(model, params, state, host="127.0.0.1", port=0, batch_size=2)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _request(server, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.server_address[1],
                                      timeout=120)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def test_healthz(server):
    status, data = _request(server, "GET", "/healthz")
    assert status == 200
    assert data["status"] == "ok" and data["params"] > 0


def test_lift_roundtrip(server):
    # 40 frames -> 2 clips (27 + stretched tail), batch padding exercised
    kpts = RNG.uniform(0, 1000, (40, 17, 2)).tolist()
    status, data = _request(server, "POST", "/lift",
                            {"keypoints": kpts, "width": 1280, "height": 720})
    assert status == 200
    poses = np.asarray(data["poses"])
    assert poses.shape == (40, 17, 3)
    assert np.isfinite(poses).all()
    np.testing.assert_allclose(poses[:, 0, :], 0.0, atol=1e-6)  # root-zeroed


def test_lift_matches_service_direct(server):
    model = KASportsFormer(KASportsFormerConfig(n_layers=2, dim_feat=32,
                                                dim_rep=64, num_heads=4))
    params, state = model.init(jax.random.key(0))
    service = LiftService(model, params, state, batch_size=4)
    kpts = RNG.uniform(0, 1000, (27, 17, 3)).astype(np.float32)
    out1 = service.lift_sequence(kpts, 1280, 720)
    out2 = service.lift_sequence(kpts, 1280, 720)  # deterministic
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == (27, 17, 3)


def test_bad_requests(server):
    status, data = _request(server, "POST", "/lift", {"width": 10})
    assert status == 400 and "error" in data
    status, data = _request(server, "POST", "/lift",
                            {"keypoints": [[1, 2]], "width": 10, "height": 10})
    assert status == 400
    status, _ = _request(server, "GET", "/nope")
    assert status == 404


def test_concurrent_requests(server):
    kpts = RNG.uniform(0, 1000, (10, 17, 2)).tolist()
    results = []

    def call():
        results.append(_request(server, "POST", "/lift",
                                {"keypoints": kpts, "width": 640,
                                 "height": 480}))

    threads = [threading.Thread(target=call) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(status == 200 for status, _ in results)
    first = np.asarray(results[0][1]["poses"])
    for status, data in results[1:]:
        np.testing.assert_array_equal(np.asarray(data["poses"]), first)


def test_lift_world_space(server):
    kpts = RNG.uniform(0, 1000, (10, 17, 2)).tolist()
    status, data = _request(server, "POST", "/lift",
                            {"keypoints": kpts, "width": 640, "height": 480,
                             "world": True})
    assert status == 200
    poses = np.asarray(data["poses"])
    # grounded (min z == 0 per frame) and max-normalized (max coord == 1)
    np.testing.assert_allclose(poses[..., 2].min(axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(poses.reshape(10, -1).max(1), 1.0, atol=1e-5)
