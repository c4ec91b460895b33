"""Per-call timing of the masked-attention Pallas kernels on the real TPU.

Chains ITERS data-dependent kernel calls inside one jit (the carry feeds the
next call's q) so the ~30 ms tunnel sync amortizes away; RNG inputs so
nothing constant-folds (docs/ROUND_NOTES.md measurement traps).

Usage: python scripts/kernel_probe.py [fwd|bwd|all]
Env:   KASF_KP_SHAPE=spatial|temporal   (default spatial: G=27, N=17)
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

from kasportsformer_tpu.ops import attention as A  # noqa: E402

B = 128
HEADS = 8
C = 128
ITERS = 24


def timeit(fn, *args):
    out = fn(*args)
    float(out)  # sync (block_until_ready is a no-op through the tunnel)
    t0 = time.perf_counter()
    out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms per call


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    shape = os.environ.get("KASF_KP_SHAPE", "spatial")
    g, n = (27, 17) if shape == "spatial" else (17, 27)
    scale = (C // HEADS) ** -0.5
    rng = np.random.default_rng(0)
    q, k, v, gr = (jnp.asarray(rng.standard_normal((B, g, n, C)),
                               jnp.bfloat16) for _ in range(4))
    print(f"device {jax.devices()[0]}  shape=({B},{g},{n},{C}) bf16",
          file=sys.stderr)

    if which in ("fwd", "all"):
        for build in ("concat", "matmul"):
            @jax.jit
            def chain(q, k, v, build=build):
                def body(c, _):
                    o = A.masked_sdpa_pallas(c, k, v, scale, HEADS,
                                             build=build)
                    return o, ()
                out, _ = jax.lax.scan(body, q, None, length=ITERS)
                return jnp.sum(out)

            try:
                ms = timeit(chain, q, k, v)
                print(f"fwd {build:7s}: {ms:6.3f} ms/call")
            except Exception as e:
                print(f"fwd {build:7s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")

    if which in ("bwd", "all"):
        for build in ("concat", "matmul"):
            @jax.jit
            def chainb(q, k, v, gr, build=build):
                def body(c, _):
                    dq, dk, dv = A.masked_sdpa_bwd_pallas(
                        c, k, v, gr, scale, HEADS, build=build)
                    return dq, (jnp.sum(dk) + jnp.sum(dv)).astype(q.dtype)
                out, extra = jax.lax.scan(body, q, None, length=ITERS)
                return jnp.sum(out) + jnp.sum(extra)

            try:
                ms = timeit(chainb, q, k, v, gr)
                print(f"bwd {build:7s}: {ms:6.3f} ms/call")
            except Exception as e:
                print(f"bwd {build:7s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
