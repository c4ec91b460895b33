"""Command-line interface.

Covers the reference's four entry points under one binary
(`python -m kasportsformer_tpu <cmd>`):

* `train` / `evaluate` ≙ `train_and_evaluate_sp.py` / `_wp.py` (dispatch on
  the config's dataset; `eval_only` in the YAML also works, like the
  reference's `main()` at `train_and_evaluate_sp.py:412-423`);
* `preprocess` ≙ `data/preprocessor/clip_generate_{sp,wp}.py`;
* `bench` ≙ the `model/model_tools.py:109-157` param/FLOPs/FPS harness.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _jax(config=None):
    import jax

    # KASF_PLATFORM overrides the JAX platform even when a sitecustomize has
    # force-registered another backend (JAX_PLATFORMS alone is not enough in
    # such environments — see .claude/skills/verify/SKILL.md).
    platform = os.environ.get("KASF_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if config is not None and config.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          config.matmul_precision)
    return jax


def cmd_train(args: argparse.Namespace) -> int:
    jax = _jax()
    from kasportsformer_tpu import parallel
    from kasportsformer_tpu.config import load_config
    from kasportsformer_tpu.data.clips import load_split
    from kasportsformer_tpu.models import build_model
    from kasportsformer_tpu.train.loop import Trainer
    from kasportsformer_tpu.utils.common import get_logger, seed_everything

    # multi-host (DCN) hook — must run before any mesh/device use
    parallel.maybe_init_distributed(
        True if getattr(args, "distributed", False) else None)
    config = load_config(args.config_path)
    if config.eval_only:
        return cmd_evaluate(args)
    _jax(config)
    seed_everything(config.seed)
    log = get_logger(config.logger_dir_path, config.logger_file_name)

    train_set = load_split(config.data_root, config.clip_set_name, "train")
    test_set = load_split(config.data_root, config.clip_set_name, "test")
    log.info(f"clips: train {len(train_set)}, test {len(test_set)}")

    model = build_model(config)
    params, state = model.init(jax.random.key(config.seed))
    log.info(f"model {config.model_name}: {model.parameter_count(params):,} params")

    fit_kwargs = {}
    if config.checkpoint:
        params, state, fit_kwargs, saved_run_id = _load_train_checkpoint(
            config, params, state, log)
        if config.resume and saved_run_id and not config.wandb_run_id:
            config = config.replace(wandb_run_id=saved_run_id)

    if config.use_wandb and not config.wandb_run_id:
        # generate once and pin it into the config so checkpoints persist it
        import uuid

        config = config.replace(wandb_run_id=uuid.uuid4().hex[:8])

    mesh = None
    if len(jax.devices()) > 1 and (config.mesh_data != 1 or config.mesh_model != 1):
        from kasportsformer_tpu import parallel

        mesh = parallel.make_mesh(config.mesh_data, config.mesh_model)
        log.info(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    metric_sink = _wandb_sink(config, log)
    trainer = Trainer(config, model, train_set, test_set, log=log,
                      metric_sink=metric_sink, mesh=mesh)
    trainer.fit(params, state, **fit_kwargs)
    return 0


def _load_train_checkpoint(config, params, state, log):
    """Weights-only load (`checkpoint: true`) or full resume (`resume: true`,
    restoring optimizer state, LR, scheduler state and wandb run id — the
    reference's intent at `train_and_evaluate_sp.py:285-301`, with a schema
    whose saver and resumer actually agree). Returns
    (params, state, fit_kwargs, saved_wandb_run_id)."""
    from kasportsformer_tpu.train import checkpoint as ckpt
    from kasportsformer_tpu.train.loop import (
        load_checkpoint_meta,
        make_optimizer,
        resume_kwargs,
    )

    path = os.path.join(config.checkpoint_dir, config.checkpoint_file_name)
    if path.endswith(".pth") and os.path.exists(path):
        sd = ckpt.load_torch_checkpoint(path)
        params, state = ckpt.torch_state_dict_to_params(sd, config.n_layers)
        log.info(f"torch checkpoint loaded ({path})")
        return params, state, {}, ""
    if os.path.isdir(path):
        template = {
            "params": params,
            "state": state,
            "opt_state": make_optimizer(config).init(params),
        }
        payload = ckpt.restore_native(path, template=template)
        params, state = payload["params"], payload["state"]
        meta = load_checkpoint_meta(path)
        fit_kwargs = (resume_kwargs(meta, payload["opt_state"])
                      if config.resume else {})
        run_id = str(meta.get("wandb_run_id", "") or "")
        log.info(f"native checkpoint loaded ({path}), resume={config.resume}")
        return params, state, fit_kwargs, run_id
    raise FileNotFoundError(f"checkpoint path is wrong: {path}")


def _wandb_sink(config, log):
    if not config.use_wandb:
        return None
    try:
        import wandb
    except ImportError:
        log.warning("use_wandb=true but wandb is not installed; metrics go to "
                    "the log file only")
        return None
    run_id = config.wandb_run_id or wandb.util.generate_id()
    # 'must' only makes sense when resuming a run that actually exists
    # (a freshly generated id with resume='must' makes wandb.init raise)
    resume_mode = "must" if (config.resume and config.wandb_run_id) else None
    wandb.init(id=run_id, name=config.wandb_name,
               project=config.wandb_project_name, resume=resume_mode)
    return lambda payload, step: wandb.log(payload, step=step)


def cmd_evaluate(args: argparse.Namespace) -> int:
    jax = _jax()
    from kasportsformer_tpu import parallel
    from kasportsformer_tpu.config import load_config

    parallel.maybe_init_distributed(
        True if getattr(args, "distributed", False) else None)
    from kasportsformer_tpu.data.clips import load_split
    from kasportsformer_tpu.models import build_model
    from kasportsformer_tpu.train import checkpoint as ckpt
    from kasportsformer_tpu.train.evaluator import Evaluator, format_eval_report
    from kasportsformer_tpu.utils.common import get_logger, seed_everything

    config = load_config(args.config_path)
    if getattr(args, "matmul_precision", None):
        # strict-parity evaluation knob (scripts/parity_gate.sh): TPU f32
        # matmuls default to bf16x3; 'highest' forces full f32 accumulation
        config = config.replace(matmul_precision=args.matmul_precision)
    _jax(config)
    seed_everything(config.seed)
    log = get_logger(config.logger_dir_path,
                     f"{config.config_name}_evaluate.log")

    test_set = load_split(config.data_root, config.clip_set_name, "test")
    model = build_model(config)

    ckpt_path = getattr(args, "checkpoint", None) or os.path.join(
        config.evaluate_checkpoint_file_dir, config.evaluate_checkpoint_file)
    if ckpt_path.endswith(".pth"):
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(
                f"evaluation checkpoint is wrong, check your configuration: {ckpt_path}")
        sd = ckpt.load_torch_checkpoint(ckpt_path)
        params, state = ckpt.torch_state_dict_to_params(sd, config.n_layers)
    elif os.path.isdir(ckpt_path):
        payload = ckpt.restore_native(ckpt_path)
        params, state = payload["params"], payload["state"]
    else:
        raise FileNotFoundError(
            f"evaluation checkpoint is wrong, check your configuration: {ckpt_path}")

    log.info(f"model {config.model_name}: {model.parameter_count(params):,} params")
    evaluator = Evaluator(
        model, test_set, batch_size=config.eval_batch_size or config.batch_size,
        flip=config.flip, input_channel_number=config.input_channel_number)
    result = evaluator.run(params, state)
    log.info("\n" + format_eval_report(result))
    print(json.dumps({k: v for k, v in result.items()
                      if isinstance(v, (int, float))}))
    return 0


def cmd_preprocess(args: argparse.Namespace) -> int:
    from kasportsformer_tpu.data.clips import (
        clipsets_from_sliced,
        clipstore_path,
        save_clipstore,
        write_reference_clip_files,
    )
    from kasportsformer_tpu.data.sources import PoseSourceReader

    dataset = args.dataset
    prefix = "SP" if dataset == "sportspose" else "WP"
    flavor = {"det": "dete" if dataset == "sportspose" else "det",
              "gt": "gt"}[args.data_type]
    set_name = args.clip_set_name or f"{prefix}{flavor}-{args.n_frames}"

    np.random.seed(args.seed)
    reader = PoseSourceReader(
        args.source_file, dataset, n_frames=args.n_frames,
        data_stride_train=args.n_frames // 3, data_stride_test=args.n_frames)
    train_d, test_d = reader.get_sliced_data()
    train, test = clipsets_from_sliced(train_d, test_d)
    print(f"train clips: {train.inputs.shape}, test clips: {test.inputs.shape}",
          file=sys.stderr)

    if args.format == "reference" or args.reference_format:
        root = os.path.join(args.output_root, set_name)
        write_reference_clip_files(root, train)
        write_reference_clip_files(root, test)
        print(f"wrote reference-format clips under {root}", file=sys.stderr)
    elif args.format == "native":
        from kasportsformer_tpu.data.clips import (
            native_clipstore_path,
            save_native_clipstore,
        )

        for split, cs in (("train", train), ("test", test)):
            path = native_clipstore_path(args.output_root, set_name, split)
            save_native_clipstore(path, cs)
            print(f"wrote {path}", file=sys.stderr)
    else:
        for split, cs in (("train", train), ("test", test)):
            path = clipstore_path(args.output_root, set_name, split)
            save_clipstore(path, cs)
            print(f"wrote {path}", file=sys.stderr)
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    """Param count / FLOPs / throughput report
    (≙ `model/model_tools.py:109-157`)."""
    jax = _jax()
    import jax.numpy as jnp

    from kasportsformer_tpu.config import Config, load_config
    from kasportsformer_tpu.models import build_model

    config = (load_config(args.config_path) if args.config_path
              else Config(compute_dtype=args.dtype))
    if args.dtype:
        config = config.replace(compute_dtype=args.dtype)
    model = build_model(config)
    params, state = model.init(jax.random.key(0))
    n_params = model.parameter_count(params)

    fwd = jax.jit(lambda p, s, x: model.apply(p, s, x, train=False)[0])
    batch = args.batch_size
    x = jnp.zeros((batch, config.n_frames, config.num_joints, config.dim_in),
                  jnp.float32)
    flops = _forward_flops(fwd, params, state, x)
    # pipelined protocol: dispatch iters batches back-to-back, synchronize
    # once by fetching a scalar (block_until_ready is a no-op through
    # remote-TPU tunnels; a per-batch scalar sync costs ~30 ms there)
    float(jnp.sum(fwd(params, state, x)))  # compile + warm
    out = None
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(params, state, x)
    float(jnp.sum(out))
    sec_per_batch = (time.perf_counter() - t0) / max(args.iters, 1)
    report = {
        "model": config.model_name,
        "params": n_params,
        "flops_per_clip": flops / batch if flops else None,
        "batch_size": batch,
        "sec_per_batch": sec_per_batch,
        "clips_per_sec": batch / sec_per_batch,
        "device": str(jax.devices()[0]),
        "dtype": config.compute_dtype,
    }
    print(json.dumps(report))
    return 0


def _forward_flops(fwd, params, state, x) -> float | None:
    try:
        analysis = fwd.lower(params, state, x).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


def cmd_demo(args: argparse.Namespace) -> int:
    _jax()
    from kasportsformer_tpu.demo.pipeline import run_demo

    video_name = os.path.splitext(os.path.basename(args.video))[0]
    output_dir = args.output_dir or os.path.join("./output", video_name)
    run_demo(args.video, output_dir, args.config_path, args.checkpoint,
             args.yolo_cfg, args.yolo_weights, args.hrnet_weights,
             elev=args.elev, azim=args.azim, hrnet_cfg=args.hrnet_cfg)
    print(os.path.join(output_dir, "demo.mp4"))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Export a native (orbax) checkpoint as a reference-layout .pth so
    reference users can load weights trained here."""
    _jax()
    import torch

    from kasportsformer_tpu.train import checkpoint as ckpt
    from kasportsformer_tpu.train.loop import load_checkpoint_meta

    payload = ckpt.restore_native(args.checkpoint)
    meta = load_checkpoint_meta(_native_dir(args.checkpoint))
    sd = ckpt.params_to_torch_state_dict(payload["params"], payload["state"],
                                         module_prefix=True)
    torch.save({"epoch": int(meta["epoch"]),
                "learning_rate": float(meta["learning_rate"]),
                "optimizer": {},
                "model": {k: torch.from_numpy(np.array(v))
                          for k, v in sd.items()},
                "min_mpjpe": float(meta["min_mpjpe"]),
                "wandb_id": str(meta.get("wandb_run_id", ""))}, args.output)
    print(args.output)
    return 0


def _native_dir(path: str) -> str:
    """Checkpoint parent dir (meta.json lives next to step_*)."""
    return (os.path.dirname(path)
            if os.path.basename(path).startswith("step_") else path)


def cmd_profile(args: argparse.Namespace) -> int:
    """Capture a jax.profiler trace of forward steps — the runtime tracing
    the reference lacks (SURVEY.md §5.1). Works through the remote-TPU
    tunnel (round-5 discovery); with --analyze, prints the on-device
    per-op SELF-time table from the perfetto trace (utils/trace.py), the
    attribution ground truth the KASF_ABLATE knobs cannot give."""
    jax = _jax()
    import jax.numpy as jnp

    from kasportsformer_tpu.config import Config, load_config
    from kasportsformer_tpu.models import build_model

    config = (load_config(args.config_path) if args.config_path else Config())
    model = build_model(config)
    params, state = model.init(jax.random.key(0))
    fwd = jax.jit(lambda p, s, x: model.apply(p, s, x, train=False)[0])
    x = jnp.zeros((args.batch_size, config.n_frames, config.num_joints,
                   config.dim_in), jnp.float32)
    # compile + sync outside the trace; block_until_ready is a no-op
    # through the axon tunnel, so sync by scalar fetch (ROUND_NOTES traps)
    float(jnp.sum(fwd(params, state, x)))
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir,
                            create_perfetto_trace=args.analyze):
        out = None
        for i in range(args.iters):
            with jax.profiler.StepTraceAnnotation("forward", step_num=i):
                out = fwd(params, state, x)
        float(jnp.sum(out))  # drain the pipeline INSIDE the trace
    print(args.trace_dir)
    if args.analyze:
        from kasportsformer_tpu.utils.trace import self_time_table

        print(self_time_table(args.trace_dir, steps=args.iters))
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """HTTP lifting service (fixed-batch jitted forward; see serving.py)."""
    _jax()
    from kasportsformer_tpu.config import load_config
    from kasportsformer_tpu.models import build_model
    from kasportsformer_tpu.serving import serve
    from kasportsformer_tpu.train import checkpoint as ckpt

    config = load_config(args.config_path)
    _jax(config)
    model = build_model(config)
    if args.checkpoint.endswith(".pth"):
        sd = ckpt.load_torch_checkpoint(args.checkpoint)
        params, state = ckpt.torch_state_dict_to_params(sd, config.n_layers)
    else:
        payload = ckpt.restore_native(args.checkpoint)
        params, state = payload["params"], payload["state"]
    server = serve(model, params, state, host=args.host, port=args.port,
                   n_frames=config.n_frames, batch_size=args.batch_size,
                   flip=config.flip, model_name=config.model_name)
    print(f"serving {config.model_name} on http://{args.host}:{args.port}",
          file=sys.stderr)
    server.serve_forever()
    return 0


def cmd_visualize(args: argparse.Namespace) -> int:
    """Offline qualitative comparison (≙ `utils/visualization.py`)."""
    jax = _jax()
    from kasportsformer_tpu.config import load_config
    from kasportsformer_tpu.data.clips import load_split
    from kasportsformer_tpu.models import build_model
    from kasportsformer_tpu.train import checkpoint as ckpt
    from kasportsformer_tpu.utils.visualization import (
        generate_prediction_clips,
        plot_prediction_clips,
    )

    config = load_config(args.config_path)
    test_set = load_split(config.data_root, config.clip_set_name, "test")
    model = build_model(config)
    if args.checkpoint.endswith(".pth"):
        sd = ckpt.load_torch_checkpoint(args.checkpoint)
        params, state = ckpt.torch_state_dict_to_params(sd, config.n_layers)
    else:
        payload = ckpt.restore_native(args.checkpoint)
        params, state = payload["params"], payload["state"]
    clip_dir = os.path.join(args.output_dir, "clips")
    n = generate_prediction_clips(model, params, state, test_set, clip_dir,
                                  flip=config.flip)
    print(f"predicted {n} clips -> {clip_dir}", file=sys.stderr)
    if args.render:
        fig_dir = os.path.join(args.output_dir, "figures")
        n = plot_prediction_clips(clip_dir, fig_dir, max_clips=args.max_clips)
        print(f"rendered {n} frames -> {fig_dir}", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="kasportsformer_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train (or eval if eval_only)")
    p_train.add_argument("--config-path", required=True)
    p_train.add_argument("--distributed", action="store_true",
                         help="multi-host: jax.distributed.initialize before "
                              "mesh construction (or set KASF_DISTRIBUTED=1)")
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("evaluate", help="evaluate a checkpoint")
    p_eval.add_argument("--config-path", required=True)
    p_eval.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize before "
                             "mesh construction (or set KASF_DISTRIBUTED=1)")
    p_eval.add_argument("--matmul-precision", default=None,
                        choices=["default", "high", "highest"])
    p_eval.add_argument("--checkpoint", default=None,
                        help="override checkpoint path (.pth or orbax dir)")
    p_eval.set_defaults(fn=cmd_evaluate)

    p_prep = sub.add_parser("preprocess", help="generate clip stores")
    p_prep.add_argument("--source-file", required=True)
    p_prep.add_argument("--dataset", choices=["sportspose", "worldpose"],
                        default="sportspose")
    p_prep.add_argument("--data-type", choices=["det", "gt"], default="gt")
    p_prep.add_argument("--n-frames", type=int, default=27)
    p_prep.add_argument("--output-root", default="./data/clips")
    p_prep.add_argument("--clip-set-name", default=None)
    p_prep.add_argument("--format", choices=["npz", "native", "reference"],
                        default="npz")
    p_prep.add_argument("--reference-format", action="store_true",
                        help="alias for --format reference")
    p_prep.add_argument("--seed", type=int, default=0)
    p_prep.set_defaults(fn=cmd_preprocess)

    p_demo = sub.add_parser("demo", help="in-the-wild video demo")
    p_demo.add_argument("--video", required=True)
    p_demo.add_argument("--config", required=True, dest="config_path")
    p_demo.add_argument("--model", required=True, dest="checkpoint",
                        help="lifter checkpoint (.pth)")
    p_demo.add_argument("--yolo-cfg", required=True)
    p_demo.add_argument("--yolo-weights", required=True)
    p_demo.add_argument("--hrnet-weights", required=True)
    p_demo.add_argument("--hrnet-cfg", default=None,
                        help="reference yacs experiment yaml for a non-w48 "
                             "HRNet layout (defaults to w48_384x288)")
    p_demo.add_argument("--output-dir", default=None)
    p_demo.add_argument("--elev", type=float, default=5)
    p_demo.add_argument("--azim", type=float, default=5)
    p_demo.set_defaults(fn=cmd_demo)

    p_bench = sub.add_parser("bench", help="params/FLOPs/throughput")
    p_bench.add_argument("--config-path", default=None)
    p_bench.add_argument("--batch-size", type=int, default=128)
    p_bench.add_argument("--iters", type=int, default=10)
    p_bench.add_argument("--dtype", default=None,
                         choices=[None, "float32", "bfloat16"])
    p_bench.set_defaults(fn=cmd_bench)

    p_export = sub.add_parser("export", help="native ckpt -> reference .pth")
    p_export.add_argument("--checkpoint", required=True)
    p_export.add_argument("--output", required=True)
    p_export.set_defaults(fn=cmd_export)

    p_prof = sub.add_parser("profile", help="capture a jax.profiler trace")
    p_prof.add_argument("--config-path", default=None)
    p_prof.add_argument("--trace-dir", default="./traces")
    p_prof.add_argument("--batch-size", type=int, default=128)
    p_prof.add_argument("--iters", type=int, default=5)
    p_prof.add_argument("--analyze", action="store_true",
                        help="write a perfetto trace and print the "
                             "on-device per-op self-time table")
    p_prof.set_defaults(fn=cmd_profile)

    p_serve = sub.add_parser("serve", help="HTTP lifting service")
    p_serve.add_argument("--config-path", required=True)
    p_serve.add_argument("--checkpoint", required=True)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--batch-size", type=int, default=8)
    p_serve.set_defaults(fn=cmd_serve)

    p_vis = sub.add_parser("visualize", help="prediction-vs-GT comparisons")
    p_vis.add_argument("--config-path", required=True)
    p_vis.add_argument("--checkpoint", required=True)
    p_vis.add_argument("--output-dir", default="./visualization")
    p_vis.add_argument("--render", action="store_true")
    p_vis.add_argument("--max-clips", type=int, default=None)
    p_vis.set_defaults(fn=cmd_visualize)
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
