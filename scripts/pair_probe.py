"""Bound the win of pairing sdpa launches (VERDICT r3 task 5's named idea).

The flagship's att and bone branches issue independent same-shape sdpa
calls (spatial pair at stage 1, temporal pair after the spatial tails) —
4 launches/layer, 104/forward. Pairing them would halve launches. There
is no actual data sharing between the pair (q/k/v all differ; only the
tiny mask constants are common), so the entire possible win is per-launch
fixed overhead + grid amortization. This probe measures exactly that:
    A: 2 sequential masked_sdpa launches on (B, G, N, C)
    B: 1 launch on (2B, G, N, C)        (identical total work)
each wrapped in a lax.scan of 52 iterations (= 26 layers x 2 pairs), so
the delta/iteration == the per-pair launch saving in the real model.

Run on a QUIET machine. python scripts/pair_probe.py [spatial|temporal]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.ops.attention import masked_sdpa

B, C, H = 128, 128, 8
SCALE = (C // H) ** -0.5
ITERS = 52


def bench(fn, args, n=20):
    # sync by scalar fetch: block_until_ready is a no-op through the axon
    # tunnel (docs/ROUND_NOTES.md round-2 traps). The scan bodies return a
    # scalar carry, so fetching the last result drains the pipeline.
    f = jax.jit(fn)
    float(f(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = f(*args)
    float(out)
    return (time.perf_counter() - t0) / n


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "spatial"
    g, n = (27, 17) if mode == "spatial" else (17, 27)
    rng = np.random.default_rng(0)

    def mk(b):
        return jnp.asarray(rng.standard_normal((b, g, n, C)), jnp.bfloat16)

    q1, k1, v1, q2, k2, v2 = (mk(B) for _ in range(6))
    qs, ks, vs = (jnp.concatenate([a, b], axis=0)
                  for a, b in ((q1, q2), (k1, k2), (v1, v2)))

    def two_launches(q1, k1, v1, q2, k2, v2):
        def body(c, _):
            a = masked_sdpa(q1 + c, k1, v1, SCALE, H)
            b = masked_sdpa(q2 + c, k2, v2, SCALE, H)
            return c + a.mean() + b.mean(), None
        out, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return out

    def one_launch(qs, ks, vs):
        def body(c, _):
            a = masked_sdpa(qs + c, ks, vs, SCALE, H)
            return c + a.mean(), None
        out, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return out

    ta = bench(two_launches, (q1, k1, v1, q2, k2, v2))
    tb = bench(one_launch, (qs, ks, vs))
    print(f"{mode}: 2x{B} = {ta*1e3:8.2f} ms   1x{2*B} = {tb*1e3:8.2f} ms   "
          f"saving {(ta-tb)*1e3:6.2f} ms /52 pairs "
          f"({(ta-tb)/ITERS*1e6:6.1f} us/pair)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
