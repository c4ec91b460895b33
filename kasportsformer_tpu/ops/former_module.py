"""Fully-fused metaformer attention module as ONE Pallas kernel.

Covers the FormerModule with attention or bone-cross-attention mixers
(`model/KASportsFormer.py:65-118`): LN -> qkv -> masked multi-head attention
(see ops/attention.py for the head-mask trick) -> proj -> LayerScale residual
-> LN -> MLP -> LayerScale residual, all VMEM-resident per batch element.
The unfused XLA pipeline crosses HBM ~10 times per module; here traffic is
x (+ x_kv) in and the module output out.

Weights ride as pallas inputs with constant index maps, so they are DMA'd
once and reused across the batch grid. Self-attention passes x_kv = x and
the same norm params for both streams.

STATUS: correct (<=1e-5 vs the unfused path) but NOT the default — measured
4.0 ms/module vs 3.3 ms unfused at batch 256 on v5e: the per-element grid
serializes the qkv/proj/MLP matmuls that XLA otherwise batches across the
whole batch at high MXU utilization. Kept as the building block for regimes
where HBM bandwidth (not MXU occupancy) dominates, e.g. very large batches
of longer clips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kasportsformer_tpu.ops.attention import _head_mask


def _ln(t, scale, bias, eps=1e-5):
    tf = t.astype(jnp.float32)
    m = jnp.mean(tf, -1, keepdims=True)
    v = jnp.mean(jnp.square(tf - m), -1, keepdims=True)
    return ((tf - m) * jax.lax.rsqrt(v + eps) * scale + bias)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gelu_exact(x):
    """Exact-form GELU via a rational erf approximation (Abramowitz-Stegun
    7.1.26, max abs error 1.5e-7 — far below bf16 resolution). Mosaic has no
    erf lowering."""
    z = x * np.float32(0.7071067811865476)
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * az)
    poly = t * (np.float32(0.254829592)
                + t * (np.float32(-0.284496736)
                       + t * (np.float32(1.421413741)
                              + t * (np.float32(-1.453152027)
                                     + t * np.float32(1.061405429)))))
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * x * (1.0 + erf)


def _former_kernel(x_ref, xkv_ref, n1s_ref, n1b_ref, n1ls_ref, n1lb_ref,
                   wq_ref, wkv_ref, wp_ref, bp_ref, n2s_ref, n2b_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, ls1_ref, ls2_ref,
                   mask_k_ref, mask_v_ref, seg_ref, out_ref, *,
                   scale: float, num_heads: int):
    x = x_ref[0]  # (G, N, C)
    g, n, c = x.shape
    h = num_heads
    dtype = x.dtype

    hq = _ln(x, n1s_ref[...], n1b_ref[...]).astype(dtype)
    hkv = _ln(xkv_ref[0], n1ls_ref[...], n1lb_ref[...]).astype(dtype)

    q = _mm(hq, wq_ref[...]).astype(dtype)  # (G, N, C)
    kv = _mm(hkv, wkv_ref[...]).astype(dtype)  # (G, N, 2C)
    k = kv[:, :, :c]
    v = kv[:, :, c:]

    # masked multi-head attention (VMEM expansion, segment-sum softmax)
    kt = jnp.swapaxes(k, 1, 2)  # (G, C, N)
    km = jnp.concatenate([kt] * h, axis=-1) * mask_k_ref[...][None]
    logits = jax.lax.dot_general(
        q, km, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    rowmax = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - rowmax)
    denom = jax.lax.dot_general(e, seg_ref[...], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    probs = (e / denom).astype(dtype)
    vm = jnp.concatenate([v] * h, axis=1) * mask_v_ref[...][None]
    att = jax.lax.dot_general(probs, vm, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32).astype(dtype)

    att = (_mm(att, wp_ref[...]) + bp_ref[...].astype(jnp.float32)).astype(dtype)
    x = x + (ls1_ref[...].astype(dtype) * att)

    h2 = _ln(x, n2s_ref[...], n2b_ref[...]).astype(dtype)
    mid = _mm(h2, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    mid = _gelu_exact(mid).astype(dtype)
    mlp_out = (_mm(mid, w2_ref[...]) + b2_ref[...].astype(jnp.float32)).astype(dtype)
    out_ref[0] = x + ls2_ref[...].astype(dtype) * mlp_out


def fused_former_module(x: jnp.ndarray, x_kv: jnp.ndarray,
                        norm1: dict, norm1_kv: dict, wq: jnp.ndarray,
                        wkv: jnp.ndarray, proj: dict, norm2: dict, mlp: dict,
                        ls1: jnp.ndarray, ls2: jnp.ndarray, scale: float,
                        num_heads: int, interpret: bool = False) -> jnp.ndarray:
    """x, x_kv: (B, G, N, C). Weight layouts follow models/layers.py:
    linears (in, out), norms {'scale','bias'}, mlp {'fc1','fc2'}."""
    b, g, n, c = x.shape
    h = num_heads
    dtype = x.dtype
    hidden = mlp["fc1"]["w"].shape[1]

    def const2d(arr):
        arr = jnp.asarray(arr, dtype)
        if arr.ndim == 1:
            arr = arr[None, :]
        return arr

    mask = _head_mask(c, h)
    mask_k = jnp.asarray(np.repeat(mask, n, axis=1), dtype)
    mask_v = jnp.asarray(np.repeat(mask, n, axis=1).T, dtype)
    seg = jnp.asarray(np.kron(np.eye(h, dtype=np.float32),
                              np.ones((n, n), np.float32)))

    operands = [
        x, x_kv,
        const2d(norm1["scale"]).astype(jnp.float32),
        const2d(norm1["bias"]).astype(jnp.float32),
        const2d(norm1_kv["scale"]).astype(jnp.float32),
        const2d(norm1_kv["bias"]).astype(jnp.float32),
        jnp.asarray(wq, dtype), jnp.asarray(wkv, dtype),
        jnp.asarray(proj["w"], dtype), const2d(proj["b"]),
        const2d(norm2["scale"]).astype(jnp.float32),
        const2d(norm2["bias"]).astype(jnp.float32),
        jnp.asarray(mlp["fc1"]["w"], dtype), const2d(mlp["fc1"]["b"]),
        jnp.asarray(mlp["fc2"]["w"], dtype), const2d(mlp["fc2"]["b"]),
        const2d(ls1), const2d(ls2),
        mask_k, mask_v, seg,
    ]

    x_spec = pl.BlockSpec((1, g, n, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def wspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape),
                            memory_space=pltpu.VMEM)

    in_specs = [x_spec, x_spec] + [wspec(op) for op in operands[2:]]
    return pl.pallas_call(
        functools.partial(_former_kernel, scale=scale, num_heads=num_heads),
        grid=(b,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(*operands)
