"""Quick perf probe: forward + train-step clips/s at batch 128 on the real
TPU. Trimmed from bench.py for A/B iteration (one batch size, both paths);
honors KASF_* env toggles. Not the driver benchmark — that's bench.py.
"""

import os
import sys
import time

import jax

if jax.default_backend() == "tpu":
    # TPU-only: a persistent CPU cache entry AOT-compiled on another
    # host machine can hang/SIGILL on load (machine-feature mismatch)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/kasf_jax_cache"))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from kasportsformer_tpu.models.kasportsformer import (  # noqa: E402
    KASportsFormer, KASportsFormerConfig)
from kasportsformer_tpu.utils.common import chunked_batch_apply  # noqa: E402


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch = int(os.environ.get("KASF_PROBE_BATCH", "128"))
    chunk = int(os.environ.get("KASF_PROBE_CHUNK", "128"))
    rng = np.random.default_rng(0)
    print(f"probe device: {jax.devices()[0]} batch={batch}", file=sys.stderr)

    model = KASportsFormer(compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.key(0))

    if which in ("fwd", "both"):
        fwd = jax.jit(lambda p, s, x: chunked_batch_apply(
            lambda xb: model.apply(p, s, xb, train=False)[0], x, chunk))
        x = jnp.asarray(rng.standard_normal((batch, 27, 17, 3)), jnp.float32)
        float(jnp.sum(fwd(params, state, x)))
        n_iter = 8
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fwd(params, state, x)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n_iter
        print(f"fwd   batch {batch}: {batch/dt:,.0f} clips/s ({dt*1e3:.2f} ms)")

    if which in ("train", "both"):
        from kasportsformer_tpu.config import Config
        from kasportsformer_tpu.train.loop import make_optimizer, make_train_step

        remat = tuple(
            n for n in os.environ.get(
                "KASF_PROBE_REMAT", "attn_core,gcn_agg,mlp_tail").split(",")
            if n) or None
        if os.environ.get("KASF_PROBE_REMAT") == "none":
            remat = None
        micro = int(os.environ.get("KASF_PROBE_MICRO", "0"))
        config = Config(batch_size=batch, flip=True, compute_dtype="bfloat16",
                        grad_microbatch=micro)
        tmodel = KASportsFormer(KASportsFormerConfig(remat_names=remat),
                                compute_dtype=jnp.bfloat16)
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
        p_t, s_t, o_t, comps = step(params, state, opt_state, arrays, idx, w,
                                    jax.random.key(0))
        float(comps["loss_total"])
        n_iter = 5
        t0 = time.perf_counter()
        for i in range(n_iter):
            p_t, s_t, o_t, comps = step(p_t, s_t, o_t, arrays, idx, w,
                                        jax.random.key(i))
        float(comps["loss_total"])
        dt = (time.perf_counter() - t0) / n_iter
        print(f"train batch {batch} remat={remat} micro={micro}: {batch/dt:,.0f} clips/s "
              f"({dt*1e3:.1f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
