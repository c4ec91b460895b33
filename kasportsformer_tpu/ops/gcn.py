"""Fused dynamic-adjacency GCN aggregation (temporal graph mixer hot path).

The reference's temporal GCN (`model/modules/graph.py:104-133`) builds, per
(batch, joint) sequence, a T x T adjacency from top-k feature similarity,
normalizes it, and aggregates value features. The jnp formulation issues two
tiny dots per group (sim: (27,C)@(C,27), agg: (27,27)@(27,C)) — at B=256
that is B*J = 4352 groups of MXU micro-ops, the same op-issue disease as the
attention core.

This kernel folds FOLD groups per grid step: one (FOLD*T, C) @ (C, FOLD*T)
similarity dot and one (FOLD*T, FOLD*T) @ (FOLD*T, C) aggregation dot, with
cross-group entries masked out via iota comparisons. The k-th-largest
threshold, degree normalization and masking all stay in VMEM.

Gradient note: every path from `tokens` through the adjacency (comparisons,
degree rsqrt of a piecewise-constant sum) has derivative exactly zero under
XLA's autodiff conventions, so the custom VJP propagates only
d_vx = norm_adj^T @ g — recomputing norm_adj in a mirror kernel — and
returns zeros for `tokens`. This matches jax.grad of the jnp formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_adj_in_vmem(tokens, valid, neighbour_num: int, out_dtype):
    """(R, C) tokens block + (R, R) validity -> (R, R) normalized adjacency
    (cross-group entries zero). Mirrors `layers.gcn` temporal mode: bf16
    similarity values, iterative-max k-th threshold, D^-1/2 A D^-1/2."""
    simf = jax.lax.dot_general(
        tokens, tokens, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # match the jnp path's dtype semantics (bf16 sim values compared)
    sim = simf.astype(out_dtype).astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(valid, sim, neg)
    for _ in range(neighbour_num - 1):
        m = jnp.max(s, axis=-1, keepdims=True)
        s = jnp.where(s >= m, neg, s)
    kth = jnp.max(s, axis=-1, keepdims=True)
    adj = jnp.where(valid & (sim >= kth), 1.0, 0.0)  # (R, R) f32
    deg = jnp.sum(adj, axis=-1)
    dinv = jax.lax.rsqrt(deg)
    return adj * dinv[:, None] * dinv[None, :]


def _gcn_fwd_kernel(tokens_ref, vx_ref, out_ref, *, neighbour_num: int,
                    fold: int, t: int):
    r = fold * t
    tokens = tokens_ref[...].reshape(r, tokens_ref.shape[-1])
    vx = vx_ref[...].reshape(r, vx_ref.shape[-1])
    grp_r = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // t
    grp_c = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // t
    norm_adj = _norm_adj_in_vmem(tokens, grp_r == grp_c, neighbour_num,
                                 tokens_ref.dtype)
    agg = jax.lax.dot_general(
        norm_adj.astype(vx.dtype), vx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = agg.astype(out_ref.dtype).reshape(out_ref.shape)


def _gcn_bwd_kernel(tokens_ref, g_ref, out_ref, *, neighbour_num: int,
                    fold: int, t: int):
    r = fold * t
    tokens = tokens_ref[...].reshape(r, tokens_ref.shape[-1])
    g = g_ref[...].reshape(r, g_ref.shape[-1])
    grp_r = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // t
    grp_c = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // t
    norm_adj = _norm_adj_in_vmem(tokens, grp_r == grp_c, neighbour_num,
                                 tokens_ref.dtype)
    # d_vx = norm_adj^T @ g
    dvx = jax.lax.dot_general(
        jnp.swapaxes(norm_adj, 0, 1).astype(g.dtype), g,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[...] = dvx.astype(out_ref.dtype).reshape(out_ref.shape)


def _call(kernel, a, b, neighbour_num: int, fold: int | None, interpret: bool):
    m, t, c = a.shape
    if fold is None:
        # FOLD*T fills one 128-lane tile (same pass-count analysis as the
        # folded attention kernel)
        fold = min(m, max(1, 128 // t))
    mp = -(-m // fold) * fold
    if mp != m:
        pad = [(0, mp - m), (0, 0), (0, 0)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    spec = pl.BlockSpec((fold, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, neighbour_num=neighbour_num, fold=fold, t=t),
        grid=(mp // fold,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=interpret,
    )(a, b)
    return out[:m] if mp != m else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dynamic_gcn_aggregate(tokens: jnp.ndarray, vx: jnp.ndarray,
                          neighbour_num: int = 4, fold: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """tokens, vx: (M, T, C) — M independent sequences. Returns
    norm_adj(tokens) @ vx per sequence, where norm_adj is the top-k
    similarity adjacency of `layers.gcn` temporal mode.

    Zero-degree rows cannot occur: every row's similarity to itself is
    finite and >= its own k-th largest, so each row has >= k neighbours.
    """
    return _call(_gcn_fwd_kernel, tokens, vx, neighbour_num, fold, interpret)


def _fwd(tokens, vx, neighbour_num, fold, interpret):
    out = _call(_gcn_fwd_kernel, tokens, vx, neighbour_num, fold, interpret)
    return out, tokens


def _bwd(neighbour_num, fold, interpret, tokens, g):
    dvx = _call(_gcn_bwd_kernel, tokens, g, neighbour_num, fold, interpret)
    return jnp.zeros_like(tokens), dvx.astype(g.dtype)


dynamic_gcn_aggregate.defvjp(_fwd, _bwd)
