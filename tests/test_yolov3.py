"""YOLOv3: cfg parsing, darknet binary weight round-trip, and forward parity
with the reference torch Darknet (same weights via the binary format)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, enable_reference_imports, reference_available

CFG = REFERENCE_ROOT + "/demo/lib/yolov3/cfg/yolov3.cfg"

pytestmark = pytest.mark.skipif(
    not reference_available() or not os.path.exists(CFG),
    reason="reference yolov3 cfg not available")


def _save_darknet_binary(model, params, path):
    """Serialize our params in the official darknet .weights layout."""
    chunks = [np.zeros(5, np.int32).tobytes()]
    for entry, p in zip(model._plan, params["layers"]):
        if entry["type"] != "convolutional":
            continue
        if entry["bn"]:
            for name in ("bn_bias", "bn_scale", "bn_mean", "bn_var"):
                chunks.append(np.asarray(p[name], np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["b"], np.float32).tobytes())
        chunks.append(np.asarray(p["w"], np.float32).tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


@pytest.fixture(scope="module")
def yolo():
    from kasportsformer_tpu.demo.yolov3 import YoloV3

    model = YoloV3(CFG)
    params = model.init_from_cfg(jax.random.key(0))
    return model, params


def test_cfg_parse_and_plan(yolo):
    model, params = yolo
    types = [e["type"] for e in model._plan]
    assert types.count("yolo") == 3
    assert types.count("convolutional") == 75
    assert model.input_dim == 416  # runtime det resolution, not the cfg's 320


def test_weight_roundtrip(tmp_path, yolo):
    model, params = yolo
    path = str(tmp_path / "w.weights")
    _save_darknet_binary(model, params, path)
    loaded = model.load_darknet_weights(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_parity_with_reference(tmp_path, yolo):
    torch = pytest.importorskip("torch")
    enable_reference_imports()
    demo_lib = REFERENCE_ROOT + "/demo"
    if demo_lib not in sys.path:
        sys.path.insert(0, demo_lib)
    from lib.yolov3.darknet import Darknet

    model, params = yolo
    path = str(tmp_path / "w.weights")
    _save_darknet_binary(model, params, path)

    tmodel = Darknet(CFG)
    tmodel.load_weights(path)
    tmodel.net_info["height"] = 416
    tmodel.eval()

    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 416, 416)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), False).numpy()
    got = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    assert got.shape == want.shape  # (1, 10647, 85)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_postprocess_and_letterbox():
    from kasportsformer_tpu.demo.yolov3 import letterbox, postprocess_humans

    img = np.zeros((720, 1280, 3), np.uint8)
    lb = letterbox(img, 416)
    assert lb.shape == (416, 416, 3)
    assert lb[0, 0, 0] == 128  # gray padding above

    # synthetic raw detections: one confident person, one overlapping dup,
    # one confident non-person
    raw = np.zeros((10, 85), np.float32)
    raw[0, :5] = [200, 200, 100, 150, 0.9]
    raw[0, 5] = 0.8  # person
    raw[1, :5] = [205, 205, 100, 150, 0.85]  # duplicate -> NMS'd
    raw[1, 5] = 0.7
    raw[2, :5] = [300, 100, 50, 50, 0.95]
    raw[2, 5 + 16] = 0.9  # class 16 (dog)
    bboxes, scores = postprocess_humans(raw, 1280, 720, 416, confidence=0.5)
    assert bboxes.shape == (1, 4)
    assert scores.shape == (1, 1)
    # box unscaled into original image coordinates
    assert 0 <= bboxes[0][0] < 1280 and 0 <= bboxes[0][3] <= 720
