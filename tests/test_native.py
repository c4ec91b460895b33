"""Native C++ clip store: round-trip, zero-copy views, threaded gather."""

import numpy as np
import pytest

from kasportsformer_tpu.native import clipstore

pytestmark = pytest.mark.skipif(
    not clipstore.is_available(), reason="no C++ toolchain available")

RNG = np.random.default_rng(9)


def test_roundtrip_and_gather(tmp_path):
    path = str(tmp_path / "train.ksf")
    inputs = RNG.standard_normal((50, 27, 17, 3)).astype(np.float32)
    labels = RNG.standard_normal((50, 27, 17, 3)).astype(np.float32)
    ids = np.arange(50, dtype=np.int64)
    clipstore.write_store(path, {"inputs": inputs, "labels": labels,
                                 "ids": ids})

    store = clipstore.NativeClipStore(path)
    assert set(store.names()) == {"inputs", "labels", "ids"}
    assert store.shape("inputs") == (50, 27, 17, 3)

    # zero-copy view matches
    np.testing.assert_array_equal(store.array("inputs"), inputs)
    np.testing.assert_array_equal(store.array("ids"), ids)

    # gathers, single- and multi-threaded
    idx = np.array([3, 0, 49, 7, 7, 21], np.int32)
    got = store.gather("labels", idx)
    np.testing.assert_array_equal(got, labels[idx])
    got_mt = store.gather("inputs", np.arange(50, dtype=np.int32), n_threads=4)
    np.testing.assert_array_equal(got_mt, inputs)

    # gather into preallocated buffer
    out = np.empty((6, 27, 17, 3), np.float32)
    got2 = store.gather("labels", idx, out=out)
    assert got2 is out
    np.testing.assert_array_equal(out, labels[idx])
    store.close()


def test_view_is_readonly(tmp_path):
    path = str(tmp_path / "s.ksf")
    clipstore.write_store(path, {"a": np.ones((4, 2), np.float32)})
    store = clipstore.NativeClipStore(path)
    view = store.array("a")
    with pytest.raises(ValueError):
        view[0, 0] = 2.0
    store.close()


def test_bad_file(tmp_path):
    path = str(tmp_path / "bad.ksf")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\0" * 100)
    with pytest.raises(OSError):
        clipstore.NativeClipStore(path)


def test_clipset_native_roundtrip(tmp_path):
    from kasportsformer_tpu.data import clips as clips_mod
    from tests.test_data import _sliced

    train_dict, test_dict = _sliced()
    train, test = clips_mod.clipsets_from_sliced(train_dict, test_dict)
    path = clips_mod.native_clipstore_path(str(tmp_path), "SET", "test")
    clips_mod.save_native_clipstore(path, test)
    back = clips_mod.load_native_clipstore(path)
    np.testing.assert_array_equal(back.inputs, test.inputs)
    np.testing.assert_array_equal(back.labels_scaled, test.labels_scaled)
    np.testing.assert_array_equal(back.actions, test.actions)
    np.testing.assert_array_equal(back.res, test.res)

    # load_split prefers the native store
    got = clips_mod.load_split(str(tmp_path), "SET", "test")
    np.testing.assert_array_equal(got.inputs, test.inputs)
