"""Data pipeline tests: normalization round-trips, clip splitting parity with
the reference readers on synthetic sources, clip store round-trips, epoch
plans and on-device augmentation."""

import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kasportsformer_tpu.data import clips as clips_mod
from kasportsformer_tpu.data import pipeline as pipe
from kasportsformer_tpu.data import sources
from tests.conftest import enable_reference_imports, reference_available
from tests.fixtures import make_source


def test_normalize_denormalize_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, size=(4, 27, 17, 3)).astype(np.float32)
    res = np.array([[1312, 1216], [1216, 1936], [1920, 1080], [1312, 1216]], np.float64)
    denorm = sources.denormalize(data, res)
    # re-normalize frame-wise
    flat = denorm.reshape(-1, 17, 3)
    res_flat = np.repeat(res, 27, axis=0)
    renorm = sources.normalize_3d(flat, res_flat).reshape(data.shape)
    np.testing.assert_allclose(renorm, data, atol=1e-5)


def test_split_clips_full_windows():
    vids = ["a"] * 36 + ["b"] * 27
    out = sources.split_clips(vids, 27, 9, randomness=False)
    got = [list(map(int, (c[0], c[-1]))) for c in out]
    # video a: windows [0,26], [9,35]; video b: [36,62]
    assert got == [[0, 26], [9, 35], [36, 62]]


def test_split_clips_short_video_resampled():
    # a short video followed by a full one: "a" is stretched to 27 frames at
    # the video boundary; a trailing short video would be dropped (the
    # boundary branch never fires at end-of-list — reference behavior).
    vids = ["a"] * 10 + ["b"] * 27
    out = sources.split_clips(vids, 27, 9, randomness=False)
    assert len(out) == 2
    assert out[0].shape == (27,)
    assert out[0].min() >= 0 and out[0].max() <= 9
    assert (np.diff(out[0]) >= 0).all()
    assert list(map(int, (out[1][0], out[1][-1]))) == [10, 36]

    # trailing short video is dropped
    assert sources.split_clips(["a"] * 10, 27, 9, randomness=False) == []


def test_split_clips_keep_tails():
    vids = ["a"] * 40 + ["b"] * 10
    out = sources.split_clips_keep_tails(vids, 27, 9, randomness=False)
    # a: windows [0,26], [9,35]; tail from 18 (len 22 >= 13.5) resampled;
    # b: trailing video never hits the boundary branch -> dropped
    assert len(out) == 3
    assert [int(out[0][0]), int(out[0][-1])] == [0, 26]
    assert [int(out[1][0]), int(out[1][-1])] == [9, 35]
    assert out[2].min() >= 18 and out[2].max() <= 39


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("with_conf", [False, True])
def test_sp_reader_parity(tmp_path, with_conf):
    """Sliced train/test tensors byte-match the reference DataReaderSportsPose
    on a synthetic source (same legacy RNG seed -> same clip boundaries)."""
    enable_reference_imports()
    from data.reader.sp_reader import DataReaderSportsPose

    src = make_source("sportspose", with_confidence=with_conf,
                      train_video_lens=(27, 36, 10), test_video_lens=(27, 54, 8))
    pkl = tmp_path / "src.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(src, f)

    np.random.seed(123)
    ref = DataReaderSportsPose(n_frames=27, sample_stride=1, data_stride_train=9,
                               data_stride_test=27, source_file_path=str(pkl))
    ref_train, ref_test = ref.get_sliced_data_sp()

    np.random.seed(123)
    mine = sources.PoseSourceReader(str(pkl), "sportspose", n_frames=27,
                                    data_stride_train=9, data_stride_test=27)
    my_train, my_test = mine.get_sliced_data()

    np.testing.assert_allclose(my_train["data"], ref_train["data"], atol=1e-6)
    np.testing.assert_allclose(my_train["label"], ref_train["label"], atol=1e-6)
    np.testing.assert_allclose(my_test["data"], ref_test["data"], atol=1e-6)
    np.testing.assert_allclose(my_test["label"], ref_test["label"], atol=1e-6)
    np.testing.assert_allclose(my_test["factor"], ref_test["factor"], atol=1e-6)
    np.testing.assert_allclose(my_test["label_scaled"], ref_test["label_scaled"], atol=1e-6)
    np.testing.assert_array_equal(my_test["action"], ref_test["action"])
    np.testing.assert_allclose(my_test["test_hw"], ref_test["test_hw"])


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_wp_reader_parity(tmp_path):
    enable_reference_imports()
    from data.reader.wp_reader import DataReaderWorldPose

    src = make_source("worldpose", train_video_lens=(27, 40), test_video_lens=(30, 27))
    pkl = tmp_path / "src.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(src, f)

    np.random.seed(7)
    ref = DataReaderWorldPose(n_frames=27, sample_stride=1, data_stride_train=9,
                              data_stride_test=27, source_file_path=str(pkl))
    ref_train, ref_test = ref.get_sliced_data_wp()

    np.random.seed(7)
    mine = sources.PoseSourceReader(str(pkl), "worldpose", n_frames=27,
                                    data_stride_train=9, data_stride_test=27)
    my_train, my_test = mine.get_sliced_data()

    np.testing.assert_allclose(my_train["data"], ref_train["data"], atol=1e-6)
    np.testing.assert_allclose(my_train["label"], ref_train["label"], atol=1e-6)
    np.testing.assert_allclose(my_test["data"], ref_test["data"], atol=1e-6)
    np.testing.assert_allclose(my_test["factor"], ref_test["factor"], atol=1e-6)
    np.testing.assert_array_equal(my_test["action"], ref_test["action"])


def _sliced(dataset="sportspose"):
    import tempfile
    src = make_source(dataset)
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pickle.dump(src, f)
        path = f.name
    reader = sources.PoseSourceReader(path, dataset, n_frames=27, seed=0)
    out = reader.get_sliced_data()
    os.unlink(path)
    return out


def test_clipset_roundtrip_packed_and_reference_format(tmp_path):
    train_dict, test_dict = _sliced()
    train, test = clips_mod.clipsets_from_sliced(train_dict, test_dict)

    # train labels are root-relative
    assert np.allclose(train.labels[..., 0, :], 0.0)

    # packed npz round-trip
    clips_mod.save_clipstore(str(tmp_path / "set" / "test.npz"), test)
    loaded = clips_mod.load_clipstore(str(tmp_path / "set" / "test.npz"))
    np.testing.assert_array_equal(loaded.inputs, test.inputs)
    np.testing.assert_array_equal(loaded.actions, test.actions)
    np.testing.assert_array_equal(loaded.res, test.res)

    # reference pkl-per-clip round-trip
    n = clips_mod.write_reference_clip_files(str(tmp_path / "refset"), test)
    assert n == len(test)
    back = clips_mod.read_reference_clip_files(str(tmp_path / "refset"), "test")
    np.testing.assert_array_equal(back.inputs, test.inputs)
    np.testing.assert_array_equal(back.labels_scaled, test.labels_scaled)
    np.testing.assert_array_equal(back.actions, test.actions)

    # load_split prefers packed, falls back to reference layout
    got = clips_mod.load_split(str(tmp_path), "refset", "test")
    np.testing.assert_array_equal(got.inputs, test.inputs)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_reference_dataset_reads_our_clip_files(tmp_path):
    """The reference SportsPose3DDataset can consume clip files we write —
    the interchange contract in both directions."""
    enable_reference_imports()
    from data.reader.sp_dataset import SportsPose3DDataset
    from easydict import EasyDict

    train_dict, test_dict = _sliced()
    train, test = clips_mod.clipsets_from_sliced(train_dict, test_dict)
    root = tmp_path / "clips" / "SPgt-27"
    clips_mod.write_reference_clip_files(str(root), train)
    clips_mod.write_reference_clip_files(str(root), test)

    args = EasyDict(model_name="KASportsFormer", input_channel_number=3,
                    data_root=str(tmp_path / "clips"), flip=False,
                    clip_set_name="SPgt-27")
    ds = SportsPose3DDataset(args_dict=args, data_split="train")
    x, y = ds[0]
    np.testing.assert_allclose(x.numpy(), train.inputs[0], atol=0)
    np.testing.assert_allclose(y.numpy(), train.labels[0], atol=0)

    ds_test = SportsPose3DDataset(args_dict=args, data_split="test")
    xt, label_scaled, factor, action, res = ds_test[0]
    np.testing.assert_allclose(xt.numpy(), test.inputs[0], atol=0)
    assert action == str(test.actions[0])


def test_epoch_plan_and_flip():
    plan = pipe.epoch_plan(10, 4, np.random.default_rng(0))
    assert plan.steps == 3
    assert plan.indices.shape == (3, 4)
    assert plan.weights.sum() == 10
    covered = plan.indices.reshape(-1)[plan.weights.reshape(-1) == 1]
    assert sorted(covered.tolist()) == list(range(10))

    # sequential plan for eval
    plan2 = pipe.epoch_plan(5, 4)
    np.testing.assert_array_equal(plan2.indices.reshape(-1)[:5], np.arange(5))

    # flip: involution + applied jointly to x and y
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 27, 17, 3)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(2).standard_normal((8, 27, 17, 3)).astype(np.float32))
    fx, fy = pipe.random_flip_batch(jax.random.key(0), x, y)
    from kasportsformer_tpu.utils.common import joint_flip
    flipped_mask = ~np.isclose(np.asarray(fx), np.asarray(x)).all(axis=(1, 2, 3))
    for i, flipped in enumerate(flipped_mask):
        if flipped:
            np.testing.assert_allclose(np.asarray(fx[i]), np.asarray(joint_flip(x[i])), atol=1e-6)
            np.testing.assert_allclose(np.asarray(fy[i]), np.asarray(joint_flip(y[i])), atol=1e-6)
        else:
            np.testing.assert_allclose(np.asarray(fy[i]), np.asarray(y[i]), atol=1e-6)
