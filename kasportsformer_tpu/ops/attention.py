"""Fused factored-attention Pallas kernel.

The flagship model's hot op is tiny-sequence multi-head attention: per
(batch, frame) a (17 x 16) @ (16 x 17) product per head — shapes that XLA can
only run at <1% MXU utilization (the 16-wide head dim lands in the 128-lane
minor dimension). The fix used on the XLA path — expanding keys/values
against a (C, H) head mask so both matmuls contract over the full 128
channels — is itself HBM-bound: the expansion materializes ~1 MB per clip
per call.

This kernel performs the SAME masked-contraction attention with the
expansion living entirely in VMEM: per grid step one batch element's
(G, N, C) q/k/v blocks are loaded once, the head-expanded (G, C, H*N) keys
and (G, H*N, C) values are built on-chip, and both attention matmuls run as
G-batched MXU dots with 128-deep contractions. HBM traffic is just
q/k/v in + out.

Softmax normalization happens AFTER the value contraction (round-3 rework):
the unnormalized exp weights go straight into the value dot, and the
per-head denominators come out of a single flat (G*N, H*N) @ (H*N, C) dot
against the value-side head mask — whose (h, j) -> head(c) structure
broadcasts each head's sum across exactly its channels. That replaces the
old in-lane-space normalization (a G-batched (N, H*N) @ (H*N, H*N)
block-diagonal segment-sum dot + a 136-lane divide) with one large
well-shaped matmul and a 128-lane divide — per sequence, MXU work drops
from ~5 lane/K passes to ~3 and the VPU drops one full-width pass.

Numerics match the jnp reference up to f32 accumulation order and one
rounding point: the exp weights round to the compute dtype before the value
dot (the old kernel rounded the normalized probabilities at the same spot).
`masked_sdpa` dispatches to the kernel on TPU and to the jnp formulation
elsewhere.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# kernel selection: "grouped" (the per-group masked-contraction Pallas
# kernel, the default) or "xla" (no Pallas — debugging / non-TPU). Retired
# variants (folded-group, tokens-major/swap_gn, fused former-module, fused
# GCN) live in git history; their measured numbers are in
# docs/ROUND_NOTES.md. Read at call (trace) time — see docs/KNOBS.md for
# the knob contract.
def _attn_impl() -> str:
    return os.environ.get("KASF_ATTN_IMPL", "grouped")


def _fwd_build_default(n: int) -> str:
    """Forward-kernel head-expansion build default, measured in-model on
    v5e (round 3): "dott" builds NO key expansion at all — q contracts the
    sublane-tiled masked keys' minor C axis directly (the lane-major km
    would be exactly ke^T). At flagship shapes it measured 1,011 clips/s
    @128 vs 925 ("matmul" tiling-operator build) vs 906 ("concat" masked
    shifts) — the expansions, not the dots, are the kernel's cost. Long
    sequences keep "concat" until zoo-measured (KTPFormer's N=243 temporal
    attention punished the N^2 "matmul" operator by -33%; dott has no such
    term but large-N defaults change only on evidence). The backward
    prefers "concat" sublane tiling (broadcast+merge measured 226 vs 232
    clips/s in-train)."""
    env = os.environ.get("KASF_ATTN_BUILD")
    if env:
        return env
    return "dott" if n <= 32 else "concat"


# head-expansion build inside the kernel: "concat" tiles keys/values with
# jnp.concatenate (lane-/sublane-misaligned at N=17 offsets — Mosaic lowers
# these to masked shifts), "matmul" builds the key expansion with a one-hot
# tiling-operator MXU dot and the value expansion with a broadcast+reshape
# (sublane merge — allowed by Mosaic, unlike lane-dim reshapes). This
# default feeds the BACKWARD kernel and direct masked_sdpa_pallas calls;
# the forward dispatch uses _fwd_build_default(). Call-time read.
def _attn_build() -> str:
    return os.environ.get("KASF_ATTN_BUILD", "concat")


# NaN-guard placement for the sdpa kernels (call/trace-time read, see
# docs/KNOBS.md). Policy values (KASF_ATTN_GUARD):
#   "outer"   (default) — callers that wrap their whole forward/step in
#             `nan_guarded` hoist the fallback to ONE lax.cond on the final
#             output (NaN from an underflowed head propagates there); the
#             fast path pays nothing per kernel call. At the kernel level
#             "outer" degrades to "percall", so a path that never wraps
#             (direct masked_sdpa users) still self-checks.
#   "percall" — every kernel call carries its own min-denominator lax.cond
#             fallback (the round-4 shape; ~2% fwd at 104 calls/forward).
#   "off"     — unchecked fast kernels (probes/ablation only: silent NaN).
#   "stable"  — unconditionally run the exact per-head _seg_rowmax variant.
# `nan_guarded` scopes the kernel-level mode via a trace-time contextvar
# ("off" for its fast trace, "stable" for its fallback trace), overriding
# the env policy inside its traces.
_GUARD_SCOPE: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "kasf_attn_guard_scope", default=None)


def _attn_guard() -> str:
    override = _GUARD_SCOPE.get()
    if override is not None:
        return override
    return os.environ.get("KASF_ATTN_GUARD", "outer")


@contextlib.contextmanager
def guard_scope(mode: str):
    """Trace-time kernel guard override ('percall' | 'off' | 'stable')."""
    token = _GUARD_SCOPE.set(mode)
    try:
        yield
    finally:
        _GUARD_SCOPE.reset(token)


def nan_guarded(fn):
    """Hoist the sdpa kernels' NaN fallback from per-call to per-`fn`.

    Under the "outer" guard policy (the default), returns a wrapper that
    traces `fn` with UNCHECKED fast kernels, reduces one isnan over the
    (small) outputs, and on NaN re-runs `fn` through the exact per-head-max
    stable kernels via a single `lax.cond` — correctness identical to the
    per-call guard (an underflowed head's 0/0 NaN propagates through every
    downstream matmul/norm to the output), at one cond per forward instead
    of 104 (measured round 5: the per-call conds cost ~2-3% fwd / ~7%
    train). Under any other policy returns `fn` unchanged (the kernels keep
    their own per-call behavior). Trace-time dispatch — wrap INSIDE jit."""
    if _attn_guard() != "outer":
        return fn

    def wrapped(*args):
        with guard_scope("off"):
            fast = fn(*args)
        leaves = [x for x in jax.tree.leaves(fast)
                  if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)]
        bad = jnp.zeros((), jnp.bool_)
        for x in leaves:
            bad = bad | jnp.isnan(x).any()

        def redo(_):
            with guard_scope("stable"):
                return fn(*args)

        return jax.lax.cond(bad, redo, lambda _: fast, None)

    return wrapped


@functools.lru_cache(maxsize=8)
def _head_mask(c: int, num_heads: int) -> np.ndarray:
    d = c // num_heads
    mask = np.zeros((c, num_heads), np.float32)
    for ch in range(c):
        mask[ch, ch // d] = 1.0
    return mask


def _build_km(kt, mask_k, rep, h: int, build: str):
    """(G, C, N) keys -> (G, C, H*N) head-tiled masked keys."""
    if build == "matmul":
        # lane tiling via the (N, H*N) tiling operator on the MXU instead of
        # h lane-misaligned concats (Mosaic lowers those to masked shifts).
        # Mosaic requires a 32-bit matmul accumulator; the operator is 0/1 so
        # the f32 accumulate + cast is exact.
        km = jax.lax.dot_general(
            kt, rep.astype(kt.dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(kt.dtype)
        return km * mask_k[None]
    return jnp.concatenate([kt] * h, axis=-1) * mask_k[None]


def _tile_sublane(z, h: int, build: str):
    """(G, N, C) -> (G, H*N, C) head tiling: broadcast + sublane merge
    ("matmul"/"dott" builds — sublane merges are allowed by Mosaic, unlike
    lane-dim reshapes) or h sublane-offset concats ("concat")."""
    if build in ("matmul", "dott"):
        gb, n0, c0 = z.shape
        return jnp.broadcast_to(z[:, None], (gb, h, n0, c0)).reshape(
            gb, h * n0, c0)
    return jnp.concatenate([z] * h, axis=1)


def _seg_rowmax(logits: jnp.ndarray, n: int, h: int) -> jnp.ndarray:
    """Per-head max of (..., N, H*N) logits, uniform across each head's
    N-lane segment — WITHOUT splitting the lane dim (Mosaic can't reshape
    it). Circular doubling: ceil(log2(N)) rounds of within-segment lane
    rotations + max; after round r every lane holds the max over a circular
    window of 2^r segment positions, so the final rounds cover the whole
    segment. A within-segment rotation by s is two global lane rolls
    (no-wrap source j+s, wrap source j+s-n) blended by a static
    position mask.

    This per-head max is a CORRECTNESS requirement, not an optimization:
    subtracting the row-GLOBAL max (softmax is shift-invariant within each
    head, so it is mathematically valid) makes every exp of a head sitting
    ~93+ below the global max underflow to 0 in bf16 (~104 in f32), giving
    denom == 0 and 0/0 = NaN for that head's channels. Sharp trained
    attention reaches such inter-head logit spreads: the round-4 overfit
    campaign NaN'd at epoch 32 exactly this way (finite params, NaN
    forward), while torch/XLA per-head softmax is immune.

    Unconditional use measured -26% whole-model forward on v5e (1,010 ->
    748 clips/s — Mosaic's lane rolls are not cheap), so the kernels run
    the global-max fast path first and re-run the softmax through this
    exact max under `pl.when` ONLY when a zero denominator proves a head
    underflowed — free when healthy, correct when sharp.
    """
    lanes = h * n
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2) % n
    m = logits
    s = 1
    while s < n:
        no_wrap = jnp.roll(m, -s, axis=-1)       # lane j <- lane j+s
        wrap = jnp.roll(m, n - s, axis=-1)       # lane j <- lane j+s-n
        m = jnp.maximum(m, jnp.where(pos + s < n, no_wrap, wrap))
        s *= 2
    return m


def _attn_kernel(q_ref, k_ref, v_ref, mask_k_ref, mask_v_ref, rep_ref,
                 out_ref, flag_ref, *, scale: float, num_heads: int,
                 build: str, stable: bool):
    blk, g0, n0, c0 = q_ref.shape

    def load(ref):
        return ref[...].reshape(blk * g0, n0, c0)

    q = load(q_ref)  # (G, N, C)
    k = load(k_ref)
    v = load(v_ref)
    h = num_heads

    if build == "dott":
        # "dott": contract q against the sublane-tiled masked keys' minor C
        # axis directly (as the backward kernel does) — km would be exactly
        # ke^T, so no lane-major key expansion is built at all. ke is the
        # same cheap broadcast+sublane-merge as vm below.
        ke = _tile_sublane(k, h, build) * mask_v_ref[...][None]  # (G,H*N,C)
        logits = jax.lax.dot_general(
            q, ke, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (G, N, H*N)
    else:
        # km: (G, C, H*N) — keys transposed, tiled over heads, masked in VMEM
        km = _build_km(jnp.swapaxes(k, 1, 2), mask_k_ref[...], rep_ref[...],
                       h, build)
        logits = jax.lax.dot_general(
            q, km, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (G, N, H*N)

    # Per-head softmax WITHOUT splitting the lane dim (Mosaic can't reshape
    # it). Default (stable=False): subtract the row-GLOBAL max — softmax is
    # shift-invariant within each head segment, but a head sitting ~93+
    # below the global max underflows its every exp to 0 and its
    # denominator to 0/0 = NaN; the caller detects that and re-runs the
    # stable=True variant, which subtracts the exact per-head _seg_rowmax
    # (too costly in VPU rolls and VMEM stack to run unconditionally —
    # docs/ROUND_NOTES.md round 4). Normalization happens AFTER the value
    # contraction (see module docstring).
    m = (_seg_rowmax(logits, n0, h) if stable
         else jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.exp(logits - m).astype(q.dtype)  # (G, N, H*N)

    # vm: (G, H*N, C) — values tiled over heads, masked
    vm = _tile_sublane(v, h, build) * mask_v_ref[...][None]
    out = jax.lax.dot_general(
        e, vm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, N, C), unnormalized
    # per-head softmax denominators, broadcast to each head's channels:
    # mask_v[(h, j), c] = [head(c) == h], so e @ mask_v sums each head's exp
    # weights and lands the sum on exactly that head's channel block.
    gb = e.shape[0]
    mask_vb = jnp.broadcast_to(mask_v_ref[...][None], (gb, h * n0, c0))
    denom = jax.lax.dot_general(
        e, mask_vb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, N, C)
    out_ref[...] = (out / denom).astype(out_ref.dtype).reshape(
        blk, g0, n0, c0)
    # underflow sentinel: a head whose every exp underflowed has denom == 0
    # (-> 0/0 = NaN on its channels). The caller's lax.cond reads this
    # scalar instead of isnan-reducing the full output (see
    # masked_sdpa_pallas). NaN inputs give a NaN flag, which compares False
    # against <= 0 — NaN then propagates without a useless stable re-run.
    # (One full lane of copies: Mosaic requires lane-width output blocks.)
    flag_ref[...] = jnp.broadcast_to(jnp.min(denom).reshape(1, 1, 1),
                                     flag_ref.shape)


def masked_sdpa_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       scale: float, num_heads: int, block_b: int = 1,
                       interpret: bool = False,
                       build: str | None = None,
                       checked: bool | None = None) -> jnp.ndarray:
    """q, k, v: (B, G, N, C) — attention over N, per (B, G). `block_b` batch
    elements are processed per grid step to amortize per-step overhead.

    `checked` (default): if the fast global-rowmax kernel underflowed a
    whole head's exps — an inter-head logit spread > ~92, see _seg_rowmax —
    re-run the stable per-head-max variant via `lax.cond`. Detection is a
    per-grid-step min-denominator flag the kernel emits (a zero denominator
    IS the pathology, and it is already computed in VMEM), so the check
    costs a (b,)-scalar compare instead of an isnan reduce over the full
    output (~2% of the whole forward at 104 calls). The stable kernel
    compiles alongside but executes only on actual underflow. The fallback
    lives at the XLA level because an in-kernel `pl.when` branch doubles
    the Mosaic VMEM stack (both paths' allocations coexist): the f32
    training shape went 212 KB, then 7.35 MB, past the 16 MB scoped limit
    that way (docs/ROUND_NOTES.md round 4).

    `checked=None` (the callers' default) resolves from the KASF_ATTN_GUARD
    knob: "percall" -> True, "off" -> False, "stable" -> run the exact
    per-head-max kernel unconditionally (no cond at all)."""
    guard = _attn_guard() if checked is None else ("percall" if checked
                                                  else "off")
    b, g, n, c = q.shape
    h = num_heads
    while b % block_b:
        block_b //= 2
    spec = pl.BlockSpec((block_b,) + q.shape[1:3] + (c,),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    mask = _head_mask(c, h)  # (C, H)
    # mask_k[c, i*n + j] = mask[c, i]; mask_v = mask_k.T
    mask_k = jnp.asarray(np.repeat(mask, n, axis=1), q.dtype)  # (C, H*N)
    mask_v = jnp.asarray(np.repeat(mask, n, axis=1).T, q.dtype)  # (H*N, C)
    mk_spec = pl.BlockSpec((c, h * n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mv_spec = pl.BlockSpec((h * n, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # (N, H*N) lane-tiling operator for the "matmul" build (9 KB; passed
    # either way to keep one kernel signature)
    rep = jnp.asarray(np.tile(np.eye(n, dtype=np.float32), (1, h)), q.dtype)
    rep_spec = pl.BlockSpec((n, h * n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    grid = b // block_b
    flag_spec = pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def call(stable: bool):
        return pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale,
                              num_heads=num_heads,
                              build=build or _attn_build(), stable=stable),
            grid=(grid,),
            in_specs=[spec, spec, spec, mk_spec, mv_spec, rep_spec],
            out_specs=[spec, flag_spec],
            out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                       jax.ShapeDtypeStruct((grid, 1, 128), jnp.float32)],
            interpret=interpret,
        )(q, k, v, mask_k, mask_v, rep)

    if guard == "stable":
        return call(stable=True)[0]
    out, flag = call(stable=False)
    if guard == "off":
        return out
    return jax.lax.cond(jnp.any(flag <= 0.0),
                        lambda: call(stable=True)[0], lambda: out)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_v_ref,
                     seg_ref, rep_ref, dq_ref, dk_ref, dv_ref, flag_ref, *,
                     scale: float, num_heads: int, build: str,
                     stable: bool):
    """Backward of the masked attention, same VMEM expansions as forward.

    With P the per-head probs, the gradients in expanded (H*N) coordinates:
      dV~ = P^T g            -> dv = E (dV~ ⊙ mask_v)
      dP  = g V~^T
      dL  = P ⊙ (dP - (P ⊙ dP) SEG) * scale
      dq  = dL K~            (K~ = head-tiled masked keys, (H*N, C) layout)
      dK~ = dL^T q           -> dk = E (dK~ ⊙ mask_v)
    where E (N, H*N) is the identity tiled across heads (a segment-collapse
    matmul) and SEG the block-diagonal ones from the per-head softmax
    normalization (the backward, unlike the forward, needs the normalized
    probabilities in lane space — dL mixes P with per-head sums of P ⊙ dP).

    The logits recompute contracts q against K~'s minor C axis directly
    (the lane-major expansion km would be exactly K~^T), so the kernel
    builds TWO expansions (K~, V~) instead of three — the builds, not the
    dots, are the kernel's dominant cost.

    A "merged" restructure (one sublane-stacked SEG dot via normalization
    factoring, lane-doubled expansions/collapses, all-input-dtype dots)
    measured -5% in-train on v5e and was retired to git history — the
    concats cost more VPU time than the merged dots save; the kernel is
    not dot-issue bound (docs/ROUND_NOTES.md).
    """
    blk, g0, n0, c0 = q_ref.shape
    h = num_heads
    f32 = jnp.float32

    def load(ref):
        return ref[...].reshape(blk * g0, n0, c0)

    q = load(q_ref)
    k = load(k_ref)
    v = load(v_ref)
    g = load(g_ref)

    # ke: (G, H*N, C) head-tiled masked keys — used BOTH for the logits
    # recompute (contracting the minor C axes of q and ke — km would be
    # exactly ke^T, so building it separately is a redundant expansion)
    # and for dq below. One expansion instead of two.
    ke = _tile_sublane(k, h, build) * mask_v_ref[...][None]  # (G,H*N,C)
    logits = jax.lax.dot_general(
        q, ke, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32) * scale
    # stable: exact per-head max — executed only via the caller's lax.cond
    # NaN fallback (see masked_sdpa_pallas's `checked` docstring)
    m = (_seg_rowmax(logits, n0, h) if stable
         else jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.exp(logits - m)  # (G, N, H*N) f32

    denom = jax.lax.dot_general(e, seg_ref[...], (((2,), (0,)), ((), ())),
                                preferred_element_type=f32)
    probs = e / denom  # (G, N, H*N) f32
    # underflow sentinel — same contract as the forward kernel's flag
    flag_ref[...] = jnp.broadcast_to(jnp.min(denom).reshape(1, 1, 1),
                                     flag_ref.shape)

    vm = _tile_sublane(v, h, build) * mask_v_ref[...][None]  # (G,H*N,C)

    # dv = E (P^T g ⊙ mask_v) — contract P's sublane N axis directly (no
    # VMEM transpose; Mosaic lowers the transposed-lhs dot natively)
    dvm = jax.lax.dot_general(
        probs.astype(q.dtype), g,
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32)  # (G,H*N,C)
    dvm = dvm * mask_v_ref[...].astype(f32)[None]
    dv = jax.lax.dot_general(rep_ref[...].astype(f32), dvm,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)  # (N, G, C) -> fix
    dv = jnp.swapaxes(dv, 0, 1)  # (G, N, C)

    # dP = g V~^T — contract the minor C axes directly (no VMEM transpose)
    dprobs = jax.lax.dot_general(
        g, vm, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)  # (G, N, H*N)
    pd = probs * dprobs
    correction = jax.lax.dot_general(pd, seg_ref[...], (((2,), (0,)), ((), ())),
                                     preferred_element_type=f32)
    dlogits = (probs * (dprobs - correction) * scale).astype(q.dtype)

    # dq = dL K~  with K~ = the same head-tiled masked keys built above
    dq = jax.lax.dot_general(dlogits, ke, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)

    # dk = E (dL^T q ⊙ mask_v) — transposed-lhs dot, no VMEM transpose
    dkm = jax.lax.dot_general(
        dlogits, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)  # (G, H*N, C)
    dkm = dkm * mask_v_ref[...].astype(f32)[None]
    dk = jax.lax.dot_general(rep_ref[...].astype(f32), dkm,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dk = jnp.swapaxes(dk, 0, 1)

    def store(ref, z):
        ref[...] = z.astype(ref.dtype).reshape(blk, g0, n0, c0)

    store(dq_ref, dq)
    store(dk_ref, dk)
    store(dv_ref, dv)


def masked_sdpa_bwd_pallas(q, k, v, g, scale: float, num_heads: int,
                           interpret: bool = False,
                           build: str | None = None,
                           checked: bool | None = None):
    """`checked`: NaN-detect + stable per-head-max re-run via lax.cond,
    exactly as in masked_sdpa_pallas (the f32 backward underflows whole
    heads at inter-head logit spreads > ~104). None -> KASF_ATTN_GUARD."""
    guard = _attn_guard() if checked is None else ("percall" if checked
                                                  else "off")
    b, g0, n, c = q.shape
    h = num_heads
    spec = pl.BlockSpec((1,) + q.shape[1:3] + (c,), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    mask = _head_mask(c, h)
    mask_v = jnp.asarray(np.repeat(mask, n, axis=1).T, q.dtype)
    seg = jnp.asarray(np.kron(np.eye(h, dtype=np.float32),
                              np.ones((n, n), np.float32)))
    rep = jnp.asarray(np.tile(np.eye(n, dtype=np.float32), (1, h)))  # (N, H*N)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape),
                            memory_space=pltpu.VMEM)

    flag_spec = pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3 + [
        jax.ShapeDtypeStruct((b, 1, 128), jnp.float32)]

    def call(stable: bool):
        return pl.pallas_call(
            functools.partial(_attn_bwd_kernel, scale=scale,
                              num_heads=num_heads,
                              build=build or _attn_build(), stable=stable),
            grid=(b,),
            in_specs=[spec, spec, spec, spec, cspec(mask_v),
                      cspec(seg), cspec(rep)],
            out_specs=[spec, spec, spec, flag_spec],
            out_shape=out_shape,
            interpret=interpret,
        )(q, k, v, g, mask_v, seg, rep)

    if guard == "stable":
        return tuple(call(stable=True)[:3])
    *grads, flag = call(stable=False)
    grads = tuple(grads)
    if guard == "off":
        return grads
    # a zero denominator poisons probs and thus every grad — the kernel's
    # min-denom flag detects it without reducing the full outputs
    return jax.lax.cond(jnp.any(flag <= 0.0),
                        lambda: tuple(call(stable=True)[:3]), lambda: grads)


def masked_sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, num_heads: int) -> jnp.ndarray:
    """jnp fallback with identical numerics (HBM-bound on TPU)."""
    *batch, n, c = q.shape
    mask = jnp.asarray(_head_mask(c, num_heads), q.dtype)
    nb = len(batch)
    bdims = tuple(range(nb))
    km = (k[..., None, :, :] * mask.T[:, None, :]).transpose(
        *bdims, nb + 2, nb, nb + 1).reshape(*batch, c, num_heads * n)
    logits = jax.lax.dot_general(
        q, km, (((nb + 1,), (nb,)), (bdims, bdims))) * scale
    logits = logits.reshape(*batch, n, num_heads, n)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    vm = (v[..., None, :, :] * mask.T[:, None, :]).reshape(
        *batch, num_heads * n, c)
    return jax.lax.dot_general(
        probs.reshape(*batch, n, num_heads * n), vm,
        (((nb + 1,), (nb,)), (bdims, bdims)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def masked_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                num_heads: int) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU for 4-D (B,G,N,C) inputs, jnp
    otherwise. Channels must split evenly across heads.

    Differentiable: pallas_call has no autodiff rule, so the custom VJP
    recomputes the forward through the XLA formulation in the backward pass
    (flash-attention-style rematerialization — residuals are just q, k, v).
    """
    if os.environ.get("KASF_ABLATE") == "attncore":
        # profiling-only: identity attention core (returns v) so the kernel
        # calls vanish — in-model attribution of the sdpa cores
        return v
    if (jax.default_backend() == "tpu" and q.shape[-1] % num_heads == 0
            and q.shape[-1] % 128 == 0 and _attn_impl() != "xla"):
        # the % 128 gate: sub-lane-width channel dims (tiny debug/dryrun
        # models) hit Mosaic layout-cast failures and gain nothing from the
        # kernel — XLA handles them
        kernel = masked_sdpa_pallas
        build = _fwd_build_default(q.shape[-2])
        if q.ndim == 4:
            return kernel(q, k, v, scale, num_heads, build=build)
        if q.ndim == 3:
            # flat (M, N, C) token streams (MixSTE/DSTFormer family): group
            # M into (M/g, g) so each grid step amortizes over g sequences
            m = q.shape[0]
            g = _group_size(m, _vmem_group_target(
                q.shape[-1], q.shape[-2], num_heads, q.dtype.itemsize))
            if g > 1:
                shape = (m // g, g) + q.shape[1:]
                out = kernel(q.reshape(shape), k.reshape(shape),
                             v.reshape(shape), scale, num_heads, build=build)
                return out.reshape(q.shape)
    return masked_sdpa_xla(q, k, v, scale, num_heads)


def _group_size(m: int, target: int = 32) -> int:
    for g in range(min(target, m), 0, -1):
        if m % g == 0:
            return g
    return 1


def _vmem_group_target(c: int, n: int, num_heads: int, itemsize: int,
                       budget_bytes: int = 3 * 1024 * 1024) -> int:
    """Largest per-step group keeping the kernel's VMEM residents (km + vm
    expansions, f32 logits + unnormalized out/denom) within budget."""
    per_seq = (2 * itemsize * c * num_heads * n        # km + vm expansions
               + 2 * 4 * n * num_heads * n             # f32 logits + denom
               + 4 * itemsize * c * n)                 # q/k/v/out blocks
    return max(1, min(32, budget_bytes // per_seq))


def _masked_sdpa_fwd(q, k, v, scale, num_heads):
    return masked_sdpa(q, k, v, scale, num_heads), (q, k, v)


def _masked_sdpa_bwd(scale, num_heads, residuals, g):
    q, k, v = residuals
    if (jax.default_backend() == "tpu" and q.shape[-1] % num_heads == 0
            and q.shape[-1] % 128 == 0 and _attn_impl() != "xla"):
        bwd = masked_sdpa_bwd_pallas
        if q.ndim == 4:
            return bwd(q, k, v, g, scale, num_heads)
        if q.ndim == 3:
            gs = _group_size(q.shape[0], _vmem_group_target(
                q.shape[-1], q.shape[-2], num_heads, q.dtype.itemsize))
            if gs > 1:
                shape = (q.shape[0] // gs, gs) + q.shape[1:]
                grads = bwd(
                    q.reshape(shape), k.reshape(shape), v.reshape(shape),
                    g.reshape(shape), scale, num_heads)
                return tuple(x.reshape(q.shape) for x in grads)
    _, vjp = jax.vjp(
        lambda a, b, c: masked_sdpa_xla(a, b, c, scale, num_heads), q, k, v)
    return vjp(g)


masked_sdpa.defvjp(_masked_sdpa_fwd, _masked_sdpa_bwd)


def masked_sdpa_tp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, num_heads: int, mesh,
                   axis_name: str = "model",
                   force_pallas_interpret: bool = False) -> jnp.ndarray:
    """Tensor-parallel masked attention: q/k/v (B, G, N, C) with the channel
    axis sharded over the mesh's `axis_name` ('model') axis.

    Heads are embarrassingly parallel, and the head mask assigns channel c to
    head c//D in contiguous blocks — so a contiguous C/tp channel shard holds
    exactly H/tp complete heads. Each chip therefore runs the SAME kernel on
    its local shard with `num_heads/tp` heads and no collectives at all; the
    output inherits the input's channel sharding (the Megatron-style
    all-reduce happens later, at the proj matmul, inserted by pjit from the
    weight specs in `parallel.param_shardings`).

    This replaces the pjit-propagation behavior around a bare `pallas_call`
    (XLA all-gathers the operands to satisfy the kernel's replicated spec —
    correct but bandwidth-wasteful). `force_pallas_interpret` runs the Pallas
    kernel in interpret mode inside the shard (CPU-mesh testing of the real
    TP x Pallas combination).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape[axis_name]
    c = q.shape[-1]
    if num_heads % tp or c % num_heads:
        raise ValueError(f"heads {num_heads} not divisible by tp={tp}")
    local_heads = num_heads // tp
    # the batch axis stays sharded over every non-'model' mesh axis (the DP
    # axes): a None there would force shard_map to all-gather the
    # data-sharded activations at the boundary — the exact waste this
    # wrapper exists to remove on the channel axis
    data_axes = tuple(a for a in mesh.axis_names if a != axis_name)
    spec = P(data_axes if data_axes else None, None, None, axis_name)

    def local(ql, kl, vl):
        if force_pallas_interpret:
            return masked_sdpa_pallas(ql, kl, vl, scale, local_heads,
                                      interpret=True)
        return masked_sdpa(ql, kl, vl, scale, local_heads)

    # check_vma must be off: pallas_call's out_shape carries no varying-mesh
    # annotation (older jax spells the kwarg check_rep)
    try:
        wrapped = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                            out_specs=spec, check_vma=False)
    except TypeError:
        wrapped = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                            out_specs=spec, check_rep=False)
    return wrapped(q, k, v)
