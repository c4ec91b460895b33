"""Round-4 convergence campaign: prove the training stack over thousands of
optimizer steps on the real TPU (the reference's de-facto correctness check
is an 800-epoch recipe, `/root/reference/train_and_evaluate_sp.py:322-402`;
this build had only ever smoked a few steps).

Modes (combine as CLI args, e.g. `python scripts/train_campaign.py overfit`):

  overfit    full Trainer, flagship 29.4M model, batch 128, a ~512-clip
             synthetic clipset built to be *consistent* (labels_scaled ==
             denorm(labels) * factor, factor == 1, small coordinate range) so
             a perfect memorizer scores ~0 mm eval MPJPE. Drives the full
             recipe — warmup -> plateau decay -> early stop — through the
             custom backward kernels. Runs bf16 and a shorter f32 control,
             reports the end-metric delta.
  stability  longer run at reference-scale clip counts watching for
             NaN/divergence; asserts every epoch's losses finite and the
             loss trend downward.
  resume     kill-and-resume: N epochs straight vs N/2 + checkpoint-restore
             + N/2; asserts the resumed parameter vector and metric curve
             match the uninterrupted run.

Each mode appends a JSON line per epoch to $KASF_CAMPAIGN_OUT/campaign_
<mode>.jsonl (default /tmp; point it at docs/campaigns/ to keep the curves
as committed evidence) and prints a summary table for docs/ROUND_NOTES.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("KASF_CAMPAIGN_CPU"):
    # this container's sitecustomize force-sets jax_platforms at interpreter
    # start (overriding JAX_PLATFORMS) — re-pin like tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")

if jax.default_backend() == "tpu":
    # persistent compile cache ONLY for the TPU: CPU executables are
    # AOT-compiled against host machine features, and this container image
    # migrates across hosts — a stale CPU cache entry loads with a
    # machine-feature mismatch and can hang/SIGILL (observed: an eager
    # fold_in spinning forever in a cached threefry executable)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/kasf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from kasportsformer_tpu.config import Config  # noqa: E402
from kasportsformer_tpu.data.clips import ClipSet  # noqa: E402
from kasportsformer_tpu.models import build_model  # noqa: E402
from kasportsformer_tpu.train.loop import Trainer  # noqa: E402

RES_W, RES_H = 1312.0, 1216.0  # SP 'outdoors' camera (sources.py)


def synthetic_clipsets(n_train: int, n_test: int, seed: int,
                       scale_px: float = 150.0,
                       tile: int = 1) -> tuple[ClipSet, ClipSet]:
    """Consistent train/test ClipSets where test clips are a subset of train
    clips (memorization target) and eval-mm == normalized error * RES_W/2
    (factor 1.0). Coordinates span ~scale_px pixels so the bf16 output
    quantization floor sits well under 1 mm."""
    n_test = min(n_test, n_train)  # test clips are drawn from train uniques
    rng = np.random.default_rng(seed)
    # smooth per-clip xy trajectories: random endpoints + linear blend +
    # noise (noise is fine — xy is part of the INPUT, so it stays
    # predictable), with z a fixed smooth DETERMINISTIC function of the 2D
    # pose. A learnable input->target mapping is what makes "<1 mm" a real
    # target: an earlier draft drew z as independent noise, which turns
    # overfitting into memorizing ~235K continuous values from clip
    # identity — the flagship plateaued at 77 mm after 100 epochs.
    def poses(n):
        a = rng.uniform(-scale_px, scale_px, size=(n, 1, 17, 2))
        b = rng.uniform(-scale_px, scale_px, size=(n, 1, 17, 2))
        t = np.linspace(0.0, 1.0, 27)[None, :, None, None]
        xy = a * (1 - t) + b * t + rng.normal(0, 5.0, size=(n, 27, 17, 2))
        z = (0.5 * scale_px * np.sin(xy[..., :1] / (0.4 * scale_px))
             + 0.4 * scale_px * np.cos(xy[..., 1:] / (0.53 * scale_px))
             + 0.3 * xy[..., :1])
        return np.concatenate([xy, z], -1).astype(np.float32)

    joint3d = poses(n_train)  # camera-space px, z relative
    # 2D = perspective-free projection of xy + center offset, conf = 1
    joint2d = joint3d[..., :2] + np.array([RES_W / 2, RES_H / 2], np.float32)
    # normalize exactly as sources.py does for SP 'outdoors'
    inp_xy = joint2d / RES_W * 2 - np.array([1, RES_H / RES_W], np.float32)
    inputs = np.concatenate(
        [inp_xy, np.ones_like(inp_xy[..., :1])], -1).astype(np.float32)
    lab_xy = inp_xy.copy()
    lab_z = (joint3d[..., 2:] / RES_W * 2).astype(np.float32)
    labels = np.concatenate([lab_xy, lab_z], -1).astype(np.float32)

    # `tile` repeats the unique clips within each epoch. The reference recipe
    # (plateau decay patience 2 + early stop patience 20, all per-EPOCH) is
    # calibrated for real datasets with hundreds of steps per epoch; at 4-16
    # steps/epoch the noisy eval decays the lr long before memorization
    # completes (measured: 512 clips -> 11.4 mm, 2048 clips -> 10.9 mm).
    # Tiling restores the recipe's intended steps-per-eval density without
    # touching its knobs or growing the memorization load.
    reps = (tile,) + (1,) * (inputs.ndim - 1)
    train = ClipSet(split="train", inputs=np.tile(inputs, reps),
                    labels=np.tile(labels - labels[..., 0:1, :], reps))
    sel = rng.permutation(n_train)[:n_test]
    # labels_scaled must equal denorm(labels) * factor for a perfect model
    # to score 0 mm: with factor=1 that is exactly the de-normalized labels
    den_xy = (lab_xy[sel] + np.array([1, RES_H / RES_W], np.float32)) * RES_W / 2
    den_z = lab_z[sel] * RES_W / 2
    labels_scaled = np.concatenate([den_xy, den_z], -1).astype(np.float32)
    actions = np.array(["serve", "smash", "dive", "sprint"])[
        np.arange(n_test) % 4]
    test = ClipSet(
        split="test", inputs=inputs[sel], labels=labels[sel],
        labels_scaled=labels_scaled,
        factors=np.ones((n_test, 27), np.float32),
        actions=actions,
        # ClipSet.res convention is (res_w, res_h) — data/clips.py:41,
        # sources.py:resolution_table. This line shipped as (H, W) through
        # every session-2/3 overfit attempt, denormalizing predictions with
        # res_w=1216 while labels_scaled used 1312: a 7.3% scale mismatch a
        # PERFECT model scores ~(1312-1216)/2 * mean|rel| ~ 11 mm on — the
        # exact "noise floor" all those runs plateaued at. The recipe was
        # never the problem.
        res=np.tile(np.array([[RES_W, RES_H]], np.float32), (n_test, 1)),
    )
    return train, test


class History:
    def __init__(self, path: str):
        self.path = path
        self.rows: list[dict] = []
        open(path, "w").close()

    def __call__(self, payload: dict, step: int) -> None:
        row = {"epoch": step,
               **{k: v for k, v in payload.items()
                  if not k.startswith(("eval_joint/", "eval_activity/"))}}
        self.rows.append(row)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"  epoch {step}: loss {row.get('train/loss_total', float('nan')):.6f}"
              f"  eval MPJPE {row['eval/mpjpe']:.4f} mm  lr {row['learning_rate']:.2e}",
              flush=True)


def run_fit(tag: str, config: Config, train_set, test_set, epochs=None,
            seed=0):
    import logging
    model = build_model(config)
    params, state = model.init(jax.random.key(seed))
    hist = History(os.path.join(
        os.environ.get("KASF_CAMPAIGN_OUT", "/tmp"),
        f"campaign_{tag}.jsonl"))
    trainer = Trainer(config, model, train_set, test_set,
                      log=logging.getLogger(tag), metric_sink=hist)
    t0 = time.time()
    params, state, summary = trainer.fit(params, state, epochs=epochs)
    wall = time.time() - t0
    for row in hist.rows:
        assert math.isfinite(row["train/loss_total"]), f"NaN loss: {row}"
        assert math.isfinite(row["eval/mpjpe"]), f"NaN eval: {row}"
    return params, state, summary, hist, wall


def base_config(**kw) -> Config:
    defaults = dict(
        batch_size=128, eval_batch_size=128, flip=False,
        compute_dtype="bfloat16", learning_rate=5e-4, epochs=800,
        warmup=True, warmup_epoches=10, training_epoch_patience=20,
        new_checkpoint_dir="/tmp/campaign_ckpt", new_checkpoint_name="c",
        logger_dir_path="")
    if os.environ.get("KASF_CAMPAIGN_TINY"):  # CPU smoke of the script itself
        defaults.update(n_layers=2, dim_feat=32, dim_rep=64, num_heads=4,
                        batch_size=16, eval_batch_size=16)
    defaults.update(kw)
    return Config(**defaults)


def mode_overfit() -> None:
    n = int(os.environ.get("KASF_CAMPAIGN_OVERFIT_CLIPS", "512"))
    tile = int(os.environ.get("KASF_CAMPAIGN_TILE", "8"))
    # The recipe's DEFAULT plateau/early-stop constants (decay 0.99 per
    # plateau, patience 20) are calibrated for real SP training where eval
    # keeps improving for hundreds of epochs; under pure memorization the
    # per-epoch eval jitter (BN running-stat lag + bf16) stalls `min_mpjpe`
    # for stretches >20 epochs long before the <1 mm target, so the v1 run
    # early-stopped at 11.1 mm. learning_rate_decay and
    # training_epoch_patience are reference config-schema knobs
    # (`train_and_evaluate_sp.py:273,399`) — the overfit mode sets them to
    # memorization-appropriate values while exercising the full recipe
    # machinery (warmup -> plateau scheduler -> early stop) end to end.
    lr_decay = float(os.environ.get("KASF_CAMPAIGN_LR_DECAY", "0.995"))
    patience = int(os.environ.get("KASF_CAMPAIGN_PATIENCE", "100"))
    print(f"== overfit: {n} clips x{tile}/epoch, flagship, bf16, "
          f"recipe w/ lr_decay={lr_decay} patience={patience} ==", flush=True)
    train_set, test_set = synthetic_clipsets(n, 256, seed=7, tile=tile)
    # checkpoint_interval=0: each ~350 MB params+optimizer save costs ~15 s
    # through the TPU tunnel — on a 2 s epoch that's 8x the training itself,
    # and the overfit/stability modes never restore (resume mode keeps 1)
    config = base_config(
        epochs=int(os.environ.get("KASF_CAMPAIGN_EPOCHS", "500")),
        learning_rate_decay=lr_decay, training_epoch_patience=patience,
        checkpoint_interval=0)
    if not os.environ.get("KASF_CAMPAIGN_SKIP_BF16"):
        _, _, summary, hist, wall = run_fit("overfit_bf16", config,
                                            train_set, test_set)
        best = summary["min_mpjpe"]
        steps = len(hist.rows) * (n * tile // 128)
        print(f"bf16: best eval MPJPE {best:.4f} mm after {len(hist.rows)} "
              f"epochs ({steps} optimizer steps, {wall:.0f}s)")
    else:
        hist = None  # f32-only rerun (time-boxed sessions)

    f32_epochs = int(os.environ.get("KASF_CAMPAIGN_F32_EPOCHS", "60"))
    config32 = base_config(compute_dtype="float32", epochs=f32_epochs,
                           learning_rate_decay=lr_decay,
                           training_epoch_patience=patience,
                           checkpoint_interval=0)
    _, _, s32, h32, wall32 = run_fit("overfit_f32", config32,
                                     train_set, test_set)
    print(f"f32 control: best {s32['min_mpjpe']:.4f} mm in {len(h32.rows)} "
          f"epochs ({wall32:.0f}s)")
    if hist is not None:
        e = min(f32_epochs, len(hist.rows), len(h32.rows)) - 1
        print(f"  at epoch {e + 1}: bf16 {hist.rows[e]['eval/mpjpe']:.4f} "
              f"vs f32 {h32.rows[e]['eval/mpjpe']:.4f} mm")
    if os.environ.get("KASF_CAMPAIGN_TINY") and hist is not None:
        assert hist.rows[-1]["eval/mpjpe"] < hist.rows[0]["eval/mpjpe"], \
            "tiny smoke: eval MPJPE did not decrease"
    else:
        # gate each dtype that actually ran (bf16 may be skipped for an
        # f32-only rerun in a time-boxed session); the f32 control gets the
        # same <1 mm bar only when given enough epochs to converge
        if hist is not None:
            assert best < 1.0, \
                f"bf16 overfit failed to reach <1 mm (best {best:.3f})"
        if f32_epochs >= 100:
            assert s32["min_mpjpe"] < 1.0, \
                f"f32 overfit failed to reach <1 mm ({s32['min_mpjpe']:.3f})"
    print("OVERFIT PASS", flush=True)


def mode_stability() -> None:
    n = int(os.environ.get("KASF_CAMPAIGN_CLIPS", "12288"))
    ep = int(os.environ.get("KASF_CAMPAIGN_EPOCHS", "12"))
    print(f"== stability: {n} clips (reference-scale), {ep} epochs, bf16 ==",
          flush=True)
    train_set, test_set = synthetic_clipsets(n, 512, seed=11)
    config = base_config(epochs=ep, flip=True,  # train-aug + TTA exercised
                         checkpoint_interval=0)
    _, _, summary, hist, wall = run_fit("stability", config,
                                        train_set, test_set)
    first, last = hist.rows[0], hist.rows[-1]
    assert last["train/loss_total"] < first["train/loss_total"], \
        "loss did not decrease over the stability run"
    steps = len(hist.rows) * math.ceil(n / 128)
    print(f"stability: {steps} steps, loss {first['train/loss_total']:.5f} -> "
          f"{last['train/loss_total']:.5f}, eval {first['eval/mpjpe']:.2f} -> "
          f"{last['eval/mpjpe']:.2f} mm, min {summary['min_mpjpe']:.2f} mm, "
          f"{wall:.0f}s ({n * len(hist.rows) / wall:.0f} clips/s incl. eval)")
    print("STABILITY PASS", flush=True)


def mode_resume() -> None:
    from kasportsformer_tpu.train import checkpoint as ckpt
    from kasportsformer_tpu.train.loop import load_checkpoint_meta, resume_kwargs
    import logging
    import shutil

    total = int(os.environ.get("KASF_CAMPAIGN_EPOCHS", "12"))
    half = total // 2
    print(f"== resume: {total} epochs straight vs {half}+{half} ==", flush=True)
    train_set, test_set = synthetic_clipsets(512, 128, seed=13)

    def make(tag, ckdir):
        shutil.rmtree(ckdir, ignore_errors=True)
        # warmup_epoches=1: the plateau scheduler is live almost the whole
        # run, so a decay firing near the split point is carried (or not)
        # by the checkpoint — the strongest resume-correctness probe
        config = base_config(epochs=total, new_checkpoint_dir=ckdir,
                             warmup_epoches=1)
        model = build_model(config)
        hist = History(os.path.join(
            os.environ.get("KASF_CAMPAIGN_OUT", "/tmp"),
            f"campaign_{tag}.jsonl"))
        return config, model, Trainer(config, model, train_set, test_set,
                                      log=logging.getLogger(tag),
                                      metric_sink=hist), hist

    config, model, trainer, hist_a = make("resume_straight", "/tmp/ck_straight")
    params0, state0 = model.init(jax.random.key(3))
    import jax.numpy as jnp
    cp = lambda t: jax.tree.map(jnp.array, t)
    p_str, s_str, _ = trainer.fit(cp(params0), cp(state0))

    config, model, trainer, hist_b = make("resume_split", "/tmp/ck_split")
    trainer.fit(cp(params0), cp(state0), epochs=half)
    latest = os.path.join("/tmp/ck_split", "c_latest")
    meta = load_checkpoint_meta(latest)
    assert meta["epoch"] == half, meta
    template = {"params": params0, "state": state0,
                "opt_state": trainer.optimizer.init(cp(params0))}
    restored = ckpt.restore_native(latest, template=template)
    p_res, s_res, _ = trainer.fit(
        jax.tree.map(jnp.asarray, restored["params"]),
        jax.tree.map(jnp.asarray, restored["state"]),
        **resume_kwargs(meta, jax.tree.map(jnp.asarray, restored["opt_state"])))

    worst = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(jax.tree.leaves(p_str), jax.tree.leaves(p_res)))
    curve_a = [r["eval/mpjpe"] for r in hist_a.rows[half:]]
    curve_b = [r["eval/mpjpe"] for r in hist_b.rows if r["epoch"] > half]
    print(f"resume: max|param delta| = {worst:.3e}; "
          f"eval curves post-resume: {curve_a} vs {curve_b}")
    assert worst == 0.0, f"resumed params diverge from straight run: {worst}"
    assert curve_a == curve_b, "resumed eval curve differs"
    print("RESUME PASS", flush=True)


MODES = {"overfit": mode_overfit, "stability": mode_stability,
         "resume": mode_resume}


def main() -> int:
    modes = sys.argv[1:] or ["overfit"]
    print(f"campaign device: {jax.devices()[0]}", flush=True)
    failures = []
    for m in modes:
        try:
            MODES[m]()
        except Exception as e:  # noqa: BLE001 — one mode failing must not
            # silently cancel the remaining modes' evidence
            import traceback
            traceback.print_exc()
            failures.append((m, f"{type(e).__name__}: {e}"))
    if failures:
        print(f"CAMPAIGN FAILURES: {failures}", flush=True)
        return 1
    print("CAMPAIGN: ALL MODES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
