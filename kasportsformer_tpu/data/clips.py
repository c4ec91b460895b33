"""Clip materialization and the packed clip store.

The reference writes ONE pickle file per clip and re-reads it on every
`__getitem__` through a pool of DataLoader worker processes
(`clip_generate_sp.py:28-79`, `sp_dataset.py:45-47`). A 27-frame clip is
~5.5 KB, so the whole clip set is a few hundred MB at most — on TPU the right
design is a single packed, memory-mappable store loaded once and kept
device-resident. This module provides:

* `ClipSet` — in-memory packed arrays for one split;
* `save_clipstore` / `load_clipstore` — one `.npz` per split (the fast path;
  also the target format for the native C++ loader);
* `write_reference_clip_files` / `read_reference_clip_files` — interchange
  with the reference's one-pkl-per-clip directory layout, so a user's
  existing `data/clips/<SET>/{train,test}` directories work unchanged.

Train labels are stored root-relative (`clip_generate_sp.py:39-40`); test
labels keep both the normalized and the 2.5D-scaled variants.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np


@dataclasses.dataclass
class ClipSet:
    """One split's clips, packed. For 'train', only inputs/labels are set.
    For 'test', the eval protocol fields are carried too."""

    split: str
    inputs: np.ndarray  # (N, T, 17, 3) float32
    labels: np.ndarray | None = None  # (N, T, 17, 3) float32 (train: root-rel)
    labels_scaled: np.ndarray | None = None  # (N, T, 17, 3)
    factors: np.ndarray | None = None  # (N, T)
    actions: np.ndarray | None = None  # (N,) unicode
    res: np.ndarray | None = None  # (N, 2) (res_w, res_h)
    envtags: np.ndarray | None = None  # (N,) unicode (SP only)

    def __len__(self) -> int:
        return len(self.inputs)


def clipsets_from_sliced(train_dict: dict, test_dict: dict,
                         root_rel: bool = True) -> tuple[ClipSet, ClipSet]:
    """Materialize ClipSets from a PoseSourceReader's sliced dicts, applying
    the reference's train-time root-relativization
    (`clip_generate_sp.py:39-40`)."""
    train_labels = np.asarray(train_dict["label"], np.float32)
    if root_rel:
        train_labels = train_labels - train_labels[..., 0:1, :]
    train = ClipSet(
        split="train",
        inputs=np.asarray(train_dict["data"], np.float32),
        labels=train_labels,
    )
    actions = test_dict["action"]
    # per reference, a clip must contain exactly one action (`:61-66`)
    actions_flat = np.array([_single(a, i, "action") for i, a in enumerate(actions)])
    envtags = test_dict.get("envtag")
    envtags_flat = (np.array([_single(e, i, "envtag") for i, e in enumerate(envtags)])
                    if envtags is not None else None)
    test = ClipSet(
        split="test",
        inputs=np.asarray(test_dict["data"], np.float32),
        labels=np.asarray(test_dict["label"], np.float32),
        labels_scaled=np.asarray(test_dict["label_scaled"], np.float32),
        factors=np.asarray(test_dict["factor"], np.float32),
        actions=actions_flat,
        res=np.asarray(test_dict["test_hw"], np.float32),
        envtags=envtags_flat,
    )
    return train, test


def _single(values, idx: int, what: str) -> str:
    uniq = set(np.asarray(values).tolist())
    if len(uniq) != 1:
        raise ValueError(f"clip {idx} contains more than one {what}: {uniq}")
    return str(next(iter(uniq)))


# ------------------------------------------------------------ packed store


def save_clipstore(path: str, clipset: ClipSet) -> None:
    """One compressed .npz per split; loads in one read, mmap-friendly."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {"split": np.array(clipset.split), "inputs": clipset.inputs}
    for name in ("labels", "labels_scaled", "factors", "actions", "res", "envtags"):
        value = getattr(clipset, name)
        if value is not None:
            payload[name] = value
    np.savez_compressed(path, **payload)


def load_clipstore(path: str) -> ClipSet:
    with np.load(path, allow_pickle=False) as z:
        kwargs = {"split": str(z["split"]), "inputs": z["inputs"]}
        for name in ("labels", "labels_scaled", "factors", "res"):
            if name in z:
                kwargs[name] = z[name]
        for name in ("actions", "envtags"):
            if name in z:
                kwargs[name] = z[name].astype(str)
    return ClipSet(**kwargs)


def clipstore_path(data_root: str, clip_set_name: str, split: str) -> str:
    return os.path.join(data_root, clip_set_name, f"{split}.npz")


# ------------------------------------------------ native (C++ mmap) store


def save_native_clipstore(path: str, clipset: ClipSet) -> None:
    """Write the KSF1 binary store (numeric fields; strings in a .json
    sidecar). Loads through the mmap + threaded-gather C++ reader."""
    import json

    from kasportsformer_tpu.native import clipstore as native

    arrays = {"inputs": clipset.inputs}
    for name in ("labels", "labels_scaled", "factors", "res"):
        value = getattr(clipset, name)
        if value is not None:
            arrays[name] = np.asarray(value, np.float32)
    native.write_store(path, arrays)
    sidecar = {"split": clipset.split}
    for name in ("actions", "envtags"):
        value = getattr(clipset, name)
        if value is not None:
            sidecar[name] = [str(v) for v in value]
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f)


def load_native_clipstore(path: str) -> ClipSet:
    import json

    from kasportsformer_tpu.native import clipstore as native

    store = native.NativeClipStore(path)
    with open(path + ".json") as f:
        sidecar = json.load(f)
    kwargs: dict = {"split": sidecar["split"]}
    # copies out of the mmap so the ClipSet owns its memory; callers that
    # want zero-copy use NativeClipStore directly
    for name in ("inputs", "labels", "labels_scaled", "factors", "res"):
        if name in store.names():
            kwargs[name] = np.array(store.array(name))
    for name in ("actions", "envtags"):
        if name in sidecar:
            kwargs[name] = np.array(sidecar[name])
    store.close()
    return ClipSet(**kwargs)


def native_clipstore_path(data_root: str, clip_set_name: str, split: str) -> str:
    return os.path.join(data_root, clip_set_name, f"{split}.ksf")


# ------------------------------------------------ reference pkl interchange


def write_reference_clip_files(root_path: str, clipset: ClipSet) -> int:
    """Write the reference's one-pkl-per-clip layout
    (train: {data_input, data_label}; test adds data_label_scaled,
    data_factor, data_res, data_action[, data_env] —
    `clip_generate_sp.py:36-77`)."""
    out_dir = os.path.join(root_path, clipset.split)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(clipset)):
        payload = {"data_input": clipset.inputs[i], "data_label": clipset.labels[i]}
        if clipset.split == "test":
            payload["data_label_scaled"] = clipset.labels_scaled[i]
            payload["data_factor"] = clipset.factors[i]
            payload["data_res"] = clipset.res[i]
            payload["data_action"] = str(clipset.actions[i])
            if clipset.envtags is not None:
                payload["data_env"] = str(clipset.envtags[i])
        with open(os.path.join(out_dir, "%08d.pkl" % i), "wb") as f:
            pickle.dump(payload, f)
    return len(clipset)


def read_reference_clip_files(root_path: str, split: str) -> ClipSet:
    """Load a reference-format clip directory into a packed ClipSet (the
    bridge for users with existing `data/clips/<SET>` trees)."""
    clip_dir = os.path.join(root_path, split)
    files = sorted(os.listdir(clip_dir))
    inputs, labels, labels_scaled, factors, actions, res, envtags = (
        [], [], [], [], [], [], [])
    for name in files:
        with open(os.path.join(clip_dir, name), "rb") as f:
            payload = pickle.load(f)
        inputs.append(np.asarray(payload["data_input"], np.float32))
        if "data_label" in payload:
            labels.append(np.asarray(payload["data_label"], np.float32))
        if split == "test":
            labels_scaled.append(np.asarray(payload["data_label_scaled"], np.float32))
            factors.append(np.asarray(payload["data_factor"], np.float32))
            actions.append(str(payload["data_action"]))
            res.append(np.asarray(payload["data_res"], np.float32))
            if "data_env" in payload:
                envtags.append(str(payload["data_env"]))
    kwargs = dict(split=split, inputs=np.stack(inputs))
    if labels:
        kwargs["labels"] = np.stack(labels)
    if split == "test":
        kwargs.update(
            labels_scaled=np.stack(labels_scaled),
            factors=np.stack(factors),
            actions=np.array(actions),
            res=np.stack(res),
        )
        if envtags:
            kwargs["envtags"] = np.array(envtags)
    return ClipSet(**kwargs)


def load_split(data_root: str, clip_set_name: str, split: str) -> ClipSet:
    """Load a split: native KSF1 store, then packed .npz, then a
    reference-format clip directory."""
    native = native_clipstore_path(data_root, clip_set_name, split)
    if os.path.exists(native):
        return load_native_clipstore(native)
    packed = clipstore_path(data_root, clip_set_name, split)
    if os.path.exists(packed):
        return load_clipstore(packed)
    ref_dir = os.path.join(data_root, clip_set_name)
    if os.path.isdir(os.path.join(ref_dir, split)):
        return read_reference_clip_files(ref_dir, split)
    raise FileNotFoundError(
        f"no clip data for {clip_set_name}/{split} under {data_root} "
        f"(looked for {native}, {packed} and {ref_dir}/{split}/*.pkl)")
