"""Fused MLP (fc1 -> exact GELU -> fc2) Pallas kernel.

Round-3 attribution (docs/ROUND_NOTES.md): the flagship's 156 MLP
sub-blocks are 40% of the forward (~80 ms at batch 128), running at ~30
TF/s under XLA — each one writes its 4x-wide hidden to HBM and reads it
back. This kernel keeps the hidden entirely in VMEM (both weights stay
resident across grid steps via constant BlockSpecs), so HBM traffic per
MLP drops from ~5x to ~2x the activation size.

GELU uses the exact-erf form (torch default, `model/modules/mlp.py`); the
Mosaic TPU compiler has no erf primitive, so erf is evaluated with the
Abramowitz & Stegun 7.1.26 rational polynomial (<=1.5e-7 analytic error
+ f32 evaluation rounding, measured <1e-6 — three orders below bf16
activation rounding; interpret-mode parity-tested).

Differentiable: pallas_call has no autodiff rule, so `fused_mlp` carries a
custom VJP that recomputes the backward through the XLA formulation
(residuals are just x and the weights). The trunk's training path keeps
the plain XLA mlp anyway (its remat policy saves the XLA hidden by name);
this kernel serves the inference/serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(x: jnp.ndarray) -> jnp.ndarray:
    """A&S 7.1.26 rational approximation, f32, |abs err| <= 1.5e-7."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # exact-erf GELU on the f32 accumulator, then one rounding to the
    # compute dtype — the same rounding points as the XLA formulation
    h = _gelu_exact_f32(h).astype(x.dtype)
    out = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


def _block_rows(m: int, c: int, hidden: int, itemsize: int,
                budget_bytes: int = 8 * 1024 * 1024) -> int:
    """Largest row block keeping x + bf16 hidden + f32 dot1 accumulator +
    out within budget (weights live outside the per-step accounting)."""
    per_row = (c * itemsize            # x block
               + hidden * itemsize     # hidden (compute dtype)
               + hidden * 4            # f32 dot1 accumulator
               + c * itemsize)         # out block
    rows = max(8, min(m, budget_bytes // per_row))
    rows -= rows % 8  # sublane multiple
    while rows >= 8 and m % rows:
        rows -= 8
    return rows


def fused_mlp_pallas(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                     w2: jnp.ndarray, b2: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (M, C); w1: (C, H); w2: (H, C). Returns (M, C)."""
    m, c = x.shape
    hidden = w1.shape[1]
    rows = _block_rows(m, c, hidden, x.dtype.itemsize)
    if m % rows:
        raise ValueError(f"no row block divides M={m}")
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(x.dtype).reshape(1, hidden)
    b2 = b2.astype(x.dtype).reshape(1, c)
    xspec = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _mlp_kernel,
        grid=(m // rows,),
        in_specs=[xspec, cspec(w1), cspec(b1), cspec(w2), cspec(b2)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _mlp_xla(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1.astype(x.dtype) + b1.astype(x.dtype),
                    approximate=False)
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


@jax.custom_vjp
def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU for well-shaped inputs (lane-aligned
    C/H, a row block divides M), XLA elsewhere. x: (..., C), flattened to
    (M, C) for the kernel."""
    c = x.shape[-1]
    hidden = w1.shape[1]
    if (jax.default_backend() == "tpu" and c % 128 == 0 and hidden % 128 == 0
            and x.size // c >= 8):
        m = x.size // c
        rows = _block_rows(m, c, hidden, x.dtype.itemsize)
        if m % rows == 0:
            out = fused_mlp_pallas(x.reshape(m, c), w1, b1, w2, b2)
            return out.reshape(x.shape)
    return _mlp_xla(x, w1, b1, w2, b2)


def _fused_mlp_fwd(x, w1, b1, w2, b2):
    return fused_mlp(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused_mlp_bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(_mlp_xla, x, w1, b1, w2, b2)
    return vjp(g)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
