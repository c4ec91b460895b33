"""CLI end-to-end: preprocess -> train (2 epochs, tiny model) -> evaluate,
all through the public `python -m kasportsformer_tpu` surface."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.conftest import REPO_ROOT
from tests.fixtures import make_source

ENV = dict(os.environ, KASF_PLATFORM="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=2",
           PYTHONPATH=REPO_ROOT)


def _run(args, cwd):
    proc = subprocess.run(
        [sys.executable, "-m", "kasportsformer_tpu", *args],
        cwd=cwd, env=ENV, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli_ws")
    src = make_source("sportspose", train_video_lens=(36, 45, 63),
                      test_video_lens=(27, 54))
    with open(ws / "source.pkl", "wb") as f:
        pickle.dump(src, f)
    return ws


def test_preprocess_train_evaluate(workspace):
    ws = workspace
    # force-CPU knob for subprocesses: sitecustomize overrides JAX_PLATFORMS,
    # so the CLI must still work — it does, just on whatever device exists.
    _run(["preprocess", "--source-file", "source.pkl", "--data-type", "gt",
          "--n-frames", "27", "--output-root", "clips"], cwd=ws)
    assert (ws / "clips" / "SPgt-27" / "train.npz").exists()
    assert (ws / "clips" / "SPgt-27" / "test.npz").exists()

    config = {
        "seed": 1, "epochs": 2, "learning_rate": 1e-3, "batch_size": 4,
        "warmup": True, "warmup_epoches": 1, "training_epoch_patience": 5,
        "lambda_mpjpe_velocity": 20.0, "lambda_n_mpjpe": 0.5,
        "use_wandb": False, "flip": True,
        "logger_dir_path": str(ws / "loggings"), "logger_file_name": "t.log",
        "data_root": "clips", "clip_set_name": "SPgt-27",
        "input_channel_number": 3, "num_joints": 17, "n_frames": 27,
        "model_name": "KASportsFormer", "n_layers": 2, "dim_feat": 32,
        "dim_rep": 64, "num_heads": 4,
        "new_checkpoint_dir": str(ws / "ckpt"), "new_checkpoint_name": "t",
        "evaluate_checkpoint_file_dir": str(ws / "ckpt"),
        "evaluate_checkpoint_file": "t_best",
    }
    with open(ws / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    _run(["train", "--config-path", "config.yaml"], cwd=ws)
    assert (ws / "ckpt" / "t_best").is_dir()
    assert (ws / "ckpt" / "t_latest").is_dir()

    proc = _run(["evaluate", "--config-path", "config.yaml",
                 "--checkpoint", str(ws / "ckpt" / "t_best" / "step_0")],
                cwd=ws)
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert np.isfinite(result["mpjpe"]) and result["mpjpe"] > 0
    assert "p_mpjpe" in result and "acceleration_error" in result

    # export the trained checkpoint to a reference-layout .pth and evaluate it
    _run(["export", "--checkpoint", str(ws / "ckpt" / "t_best"),
          "--output", str(ws / "exported.pth")], cwd=ws)
    proc2 = _run(["evaluate", "--config-path", "config.yaml",
                  "--checkpoint", str(ws / "exported.pth")], cwd=ws)
    result2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert abs(result2["mpjpe"] - result["mpjpe"]) < 1e-3

    # offline qualitative visualization (prediction clips only)
    _run(["visualize", "--config-path", "config.yaml",
          "--checkpoint", str(ws / "exported.pth"),
          "--output-dir", str(ws / "vis")], cwd=ws)
    assert len(list((ws / "vis" / "clips").glob("*.pkl"))) > 0


def test_worldpose_preprocess_and_evaluate(tmp_path):
    """WP flavor end-to-end: keep-tails splitting, no envtags, native store."""
    ws = tmp_path
    src = make_source("worldpose", train_video_lens=(40, 36),
                      test_video_lens=(27, 40))
    with open(ws / "wp.pkl", "wb") as f:
        pickle.dump(src, f)
    _run(["preprocess", "--source-file", "wp.pkl", "--dataset", "worldpose",
          "--data-type", "gt", "--output-root", "clips", "--format", "native"],
         cwd=ws)
    assert (ws / "clips" / "WPgt-27" / "test.ksf").exists()

    config = {
        "seed": 1, "epochs": 1, "learning_rate": 1e-3, "batch_size": 4,
        "warmup": False, "training_epoch_patience": 5, "use_wandb": False,
        "flip": True, "logger_dir_path": str(ws / "log"),
        "logger_file_name": "wp.log", "data_root": "clips",
        "clip_set_name": "WPgt-27", "dataset": "worldpose",
        "input_channel_number": 3, "num_joints": 17, "n_frames": 27,
        "model_name": "KASportsFormer", "n_layers": 2, "dim_feat": 32,
        "dim_rep": 64, "num_heads": 4,
        "new_checkpoint_dir": str(ws / "ckpt"), "new_checkpoint_name": "wp",
        "evaluate_checkpoint_file_dir": str(ws / "ckpt"),
        "evaluate_checkpoint_file": "wp_best",
    }
    with open(ws / "wp.yaml", "w") as f:
        yaml.safe_dump(config, f)
    _run(["train", "--config-path", "wp.yaml"], cwd=ws)
    proc = _run(["evaluate", "--config-path", "wp.yaml",
                 "--checkpoint", str(ws / "ckpt" / "wp_best")], cwd=ws)
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert np.isfinite(result["mpjpe"])


def test_reference_yaml_configs_load():
    from kasportsformer_tpu.config import load_config

    for name in ("sportspose-gt", "sportspose-det", "worldpose-gt", "worldpose-det"):
        cfg = load_config(os.path.join(REPO_ROOT, "configs",
                                       f"{name}-kasportsformer.yaml"))
        assert cfg.model_name == "KASportsFormer"
        assert cfg.n_layers == 26 and cfg.num_heads == 8
        assert cfg.dataset == ("worldpose" if name.startswith("world") else "sportspose")

    ref_dir = "/root/reference/configs"
    if os.path.isdir(ref_dir):
        for fn in os.listdir(ref_dir):
            cfg = load_config(os.path.join(ref_dir, fn))
            assert cfg.n_frames == 27


def test_resume_restores_training_state(workspace):
    """checkpoint+resume restores optimizer state, LR, scheduler, and epoch
    (the reference's resume path is broken — SURVEY §5.4)."""
    ws = workspace
    with open(ws / "config.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg.update({"checkpoint": True, "resume": True, "epochs": 3,
                "checkpoint_dir": str(ws / "ckpt"),
                "checkpoint_file_name": "t_latest",
                "warmup": False, "learning_rate": 5e-4})
    with open(ws / "resume.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    _run(["train", "--config-path", "resume.yaml"], cwd=ws)
    meta = json.loads((ws / "ckpt" / "t_latest" / "meta.json").read_text())
    assert meta["epoch"] == 3  # continued from epoch 2 -> ran epoch 3 only
    assert meta["min_mpjpe"] > 0


def test_distributed_flag_parses_and_reaches_hook(monkeypatch):
    """--distributed parses on train/evaluate and routes into
    `parallel.maybe_init_distributed` -> `jax.distributed.initialize`
    (SURVEY §5.8 multi-host entry point). Single-host default is a no-op."""
    import jax

    from kasportsformer_tpu import parallel
    from kasportsformer_tpu.cli import build_parser

    parser = build_parser()
    for cmd in ("train", "evaluate"):
        ns = parser.parse_args([cmd, "--config-path", "x.yaml", "--distributed"])
        assert ns.distributed is True
        ns = parser.parse_args([cmd, "--config-path", "x.yaml"])
        assert ns.distributed is False

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(parallel, "_distributed_initialized", False)
    # off by default (no flag, no env)
    monkeypatch.delenv("KASF_DISTRIBUTED", raising=False)
    assert parallel.maybe_init_distributed(None) is False
    assert calls == []
    # env-driven
    monkeypatch.setenv("KASF_DISTRIBUTED", "1")
    assert parallel.maybe_init_distributed(None) is True
    assert len(calls) == 1
    # idempotent
    assert parallel.maybe_init_distributed(True) is False
    assert len(calls) == 1


def test_trace_self_time_analysis(tmp_path):
    """utils/trace.py: self-times subtract nested children (scopes like
    while/checkpoint don't double-count) and Pallas custom-calls classify
    by output signature — against a synthetic perfetto trace."""
    import gzip
    import json

    from kasportsformer_tpu.utils.trace import (
        device_self_times,
        load_perfetto_events,
        self_time_table,
    )

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # a 100us scope containing a 60us Pallas sdpa-fwd-shaped call:
        # scope self-time must be 40
        {"ph": "X", "pid": 1, "tid": 3, "ts": 0, "dur": 100,
         "name": "while.1", "args": {}},
        {"ph": "X", "pid": 1, "tid": 3, "ts": 10, "dur": 60,
         "name": "closed_call.7",
         "args": {"long_name": "%closed_call.7 = (bf16[2,4,17,128]{3,2,1,0},"
                  " f32[2,1,128]{2,1,0:T(1,128)}) custom-call(bf16[...])"}},
        # host-side event must be ignored
        {"ph": "X", "pid": 9, "tid": 1, "ts": 0, "dur": 500,
         "name": "python", "args": {}},
    ]
    with gzip.open(d / "perfetto_trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    loaded = load_perfetto_events(str(tmp_path))
    self_us, long_names = device_self_times(loaded)
    assert self_us["while.1"] == 40
    assert self_us["closed_call.7"] == 60
    assert sum(self_us.values()) == 100

    table = self_time_table(str(tmp_path), steps=1)
    assert "pallas sdpa FWD kernel" in table
    assert "0.1 ms/step" in table  # total = 100us
