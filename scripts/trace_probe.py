"""On-device op-level attribution of the fused train step via the JAX
profiler (works through the axon tunnel — verified round 5: the perfetto
trace carries real `/device:TPU:0` "XLA Ops" events whose self-times sum to
the measured step within ~1%).

This is the ground truth the ablation battery cannot give: KASF_ABLATE
dead-code-eliminates an op from the PRIMAL only, so for ops with a custom
VJP (the sdpa kernels) the backward kernel keeps running in the ablated
step and the delta under-reports the true cost. Round-5 finding: ablation
said "sdpa 51.9 ms/step"; this trace shows sdpa fwd 38.5 + sdpa BWD 134 =
~172 ms/step — the backward kernel is the largest single term of the train
step (29%).

Usage:  python scripts/trace_probe.py [--steps 2] [--micro 32] [--batch 128]
Prints the top self-time groups and the named Pallas custom-call terms.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/kasf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def capture(steps: int, batch: int, micro: int, logdir: str) -> None:
    from kasportsformer_tpu.config import Config
    from kasportsformer_tpu.models.kasportsformer import (
        KASportsFormer, KASportsFormerConfig)
    from kasportsformer_tpu.train.loop import make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    model = KASportsFormer(compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.key(0))
    config = Config(batch_size=batch, flip=True, compute_dtype="bfloat16",
                    grad_microbatch=micro)
    remat = tuple(n for n in os.environ.get(
        "KASF_PROBE_REMAT", "attn_core,gcn_agg,mlp_tail").split(",") if n)
    tmodel = KASportsFormer(
        KASportsFormerConfig(remat_names=remat), compute_dtype=jnp.bfloat16)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    step = make_train_step(tmodel, config, optimizer)
    arrays = {
        "inputs": jnp.asarray(
            rng.standard_normal((1024, 27, 17, 3)), jnp.float32),
        "labels": jnp.asarray(
            rng.standard_normal((1024, 27, 17, 3)), jnp.float32),
    }
    idx = jnp.arange(batch, dtype=jnp.int32)
    w = jnp.ones(batch, jnp.float32)
    p, s, o, c = step(params, state, opt_state, arrays, idx, w,
                      jax.random.key(0))
    print("warm loss:", float(c["loss_total"]), file=sys.stderr)
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        for i in range(steps):
            p, s, o, c = step(p, s, o, arrays, idx, w, jax.random.key(i))
        float(c["loss_total"])


def analyze(logdir: str, steps: int) -> None:
    from kasportsformer_tpu.utils.trace import (
        device_self_times, load_perfetto_events, self_time_table)

    print(self_time_table(logdir, steps=steps))
    events = load_perfetto_events(logdir)
    self_us, long_names = device_self_times(events)
    print("\ntop individual ops (self-time):")
    for name, us in self_us.most_common(15):
        ln = long_names.get(name, "")[:110].replace("\n", " ")
        print(f"  {us / steps / 1e3:8.2f} ms/step  {name}  {ln}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--micro", type=int, default=32)
    ap.add_argument("--logdir", default="/tmp/kasf_trace_probe")
    ap.add_argument("--analyze-only", action="store_true",
                    help="re-analyze an existing trace dir")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.steps, args.batch, args.micro, args.logdir)
    analyze(args.logdir, args.steps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
