"""Eval-protocol throughput probe on the real TPU: the full metric-defining
path (flip-TTA doubled-batch forward -> root-zero -> denorm -> 2.5D scale ->
on-device MPJPE/JPE/accel/P-MPJPE) over a synthetic test ClipSet.

Same pipelined protocol as bench.py: dispatch N batches back-to-back, sync
once (per-batch host syncs are not part of the serving path).
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

from kasportsformer_tpu.models.kasportsformer import KASportsFormer  # noqa: E402
from kasportsformer_tpu.train.evaluator import make_eval_step  # noqa: E402


def main() -> int:
    batch = int(os.environ.get("KASF_PROBE_BATCH", "128"))
    rng = np.random.default_rng(0)
    n = 1024
    print(f"eval probe device: {jax.devices()[0]} batch={batch}",
          file=sys.stderr)

    model = KASportsFormer(compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.key(0))
    arrays = {
        "inputs": jnp.asarray(rng.standard_normal((n, 27, 17, 3)), jnp.float32),
        "labels_scaled": jnp.asarray(
            rng.standard_normal((n, 27, 17, 3)), jnp.float32),
        "factors": jnp.asarray(rng.uniform(0.5, 2.0, (n, 27)), jnp.float32),
        "res": jnp.asarray(np.tile([1920.0, 1080.0], (n, 1)), jnp.float32),
    }
    step = make_eval_step(model, flip=True)
    idx = jnp.arange(batch, dtype=jnp.int32)
    out = step(params, state, arrays, idx)
    float(jnp.sum(out["mpjpe"]))  # compile + warm (sync via scalar fetch)
    n_iter = 8
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(params, state, arrays, idx)
    float(jnp.sum(out["mpjpe"]))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"eval protocol batch {batch}: {batch/dt:,.0f} clips/s "
          f"({dt*1e3:.2f} ms/batch)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
