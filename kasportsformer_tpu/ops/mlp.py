"""Fused MLP (fc1 -> exact GELU -> fc2) Pallas kernel.

Round-3 attribution (docs/ROUND_NOTES.md): the flagship's 156 MLP
sub-blocks are 40% of the forward (~80 ms at batch 128), running at ~30
TF/s under XLA — each one writes its 4x-wide hidden to HBM and reads it
back. This kernel keeps the hidden entirely in VMEM (both weights stay
resident across grid steps via constant BlockSpecs), so HBM traffic per
MLP drops from ~5x to ~2x the activation size.

GELU uses the exact-erf form (torch default, `model/modules/mlp.py`); the
Mosaic TPU compiler has no erf primitive. Two in-kernel evaluations:

* f32 compute: Abramowitz & Stegun 7.1.26 rational polynomial (<=1.5e-7
  analytic error + f32 evaluation rounding, measured <1e-6 — three orders
  below bf16 activation rounding) — keeps the strict-parity eval path
  (`--matmul-precision highest`) at reference precision.
* bf16 compute: a div/exp-free odd polynomial,
  gelu(x) ~= 0.5x + x^2*Q(x^2) on |x|<=4 with linear/zero tails
  (~14 VPU ops vs ~35+ incl. divide+exp for A&S). Max abs error 1.27e-4
  (at the |x|=4 tail joint), ~45x below the bf16 rounding noise floor of
  the following fc2 dot — measured round 3, and the dominant VPU-time
  term in the kernel (the MXU dots are ~1.5 ns/row; the A&S transcendental
  chain ~3x that).

Differentiable: pallas_call has no autodiff rule, so `fused_mlp` carries a
custom VJP that recomputes the backward through the XLA formulation
(residuals are just x and the weights). The trunk's training path keeps
the plain XLA mlp anyway (its remat policy saves the XLA hidden by name);
this kernel serves the inference/serving path.
"""

from __future__ import annotations

import os

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


# Q(s) coefficients, s = x^2, for gelu(x) ~= 0.5x + s*Q(s) on |x| <= 4
# (weighted lstsq fit minimizing absolute gelu error; see module docstring)
_GELU_POLY_B = 4.0
_GELU_POLY_COEF = (
    0.3986886712, -0.06592223389, 0.009528707336, -0.001013580463,
    7.597136e-05, -3.751622179e-06, 1.082753984e-07, -1.371763255e-09,
)


def _gelu_poly_f32(x: jnp.ndarray) -> jnp.ndarray:
    """div/exp-free GELU: odd polynomial core + exact linear/zero tails.
    Max abs error 1.27e-4 — for bf16 activations only (sub-rounding)."""
    s = x * x
    q = jnp.float32(_GELU_POLY_COEF[-1])
    for c in _GELU_POLY_COEF[-2::-1]:
        q = q * s + jnp.float32(c)
    core = 0.5 * x + s * q
    b = jnp.float32(_GELU_POLY_B)
    return jnp.where(x > b, x, jnp.where(x < -b, jnp.float32(0.0), core))


def _gelu_tanh_f32(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-form GELU on the NATIVE Mosaic tanh (~6 VPU ops, no tail
    selects — tanh saturates on its own). Max abs deviation from the exact
    erf form 4.8e-4, ~8x below the bf16 rounding of the following fc2 dot.
    For bf16 activations only."""
    s = x * x
    u = jnp.float32(0.7978845608 * 0.044715) * s + jnp.float32(0.7978845608)
    return 0.5 * x * (1.0 + jnp.tanh(x * u))


# bf16-path GELU evaluation: "tanh" (native-tanh form, ~6 VPU ops) vs
# "poly" (14-op odd polynomial). The GELU over the 4x-wide hidden is the
# kernel's dominant VPU term (module docstring) — this is the A/B for it.
_GELU_IMPL = os.environ.get("KASF_GELU", "tanh")


def _gelu_bf16(x: jnp.ndarray) -> jnp.ndarray:
    return _gelu_tanh_f32(x) if _GELU_IMPL == "tanh" else _gelu_poly_f32(x)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # GELU on the f32 accumulator, then one rounding to the compute dtype
    # — the same rounding points as the XLA formulation. bf16 compute uses
    # the cheap polynomial (error sub-rounding); f32 keeps exact erf.
    gelu_fn = _gelu_bf16 if x.dtype == jnp.bfloat16 else _gelu_exact_f32
    h = gelu_fn(h).astype(x.dtype)
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


def _mlp_ln_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   ls_ref, out_ref, *, eps: float):
    """Whole FormerModule tail in one VMEM pass:
    out = x + ls ⊙ (GELU(LN(x) @ w1 + b1) @ w2 + b2).
    Folding LN + LayerScale + residual into the MLP kernel removes four HBM
    round-trips of the (M, C) stream per sub-block (LN write+read, MLP-out
    write, residual read) — ~12 ms/batch across the flagship's 156 tails."""
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    a = (xhat * g_ref[...].astype(jnp.float32)
         + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(
        a, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    gelu_fn = _gelu_bf16 if x.dtype == jnp.bfloat16 else _gelu_exact_f32
    h = gelu_fn(h).astype(x.dtype)
    out = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    out = xf + ls_ref[...].astype(jnp.float32) * out
    out_ref[...] = out.astype(out_ref.dtype)


def fused_mlp_ln_pallas(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                        w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                        b2: jnp.ndarray, ls2: jnp.ndarray, eps: float = 1e-5,
                        interpret: bool = False) -> jnp.ndarray:
    """x: (M, C). Returns x + ls2 * MLP(LN(x)) as (M, C)."""
    import functools

    m, c = x.shape
    hidden = w1.shape[1]
    rows = _block_rows(m, c, hidden, x.dtype.itemsize)
    if m % rows:
        raise ValueError(f"no row block divides M={m}")
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(x.dtype).reshape(1, hidden)
    b2 = b2.astype(x.dtype).reshape(1, c)
    gamma = gamma.astype(jnp.float32).reshape(1, c)
    beta = beta.astype(jnp.float32).reshape(1, c)
    ls2 = ls2.astype(jnp.float32).reshape(1, c)
    xspec = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mlp_ln_kernel, eps=eps),
        grid=(m // rows,),
        in_specs=[xspec, cspec(gamma), cspec(beta), cspec(w1), cspec(b1),
                  cspec(w2), cspec(b2), cspec(ls2)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(x, gamma, beta, w1, b1, w2, b2, ls2)


def _mlp_ln_xla(x, gamma, beta, w1, b1, w2, b2, ls2, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    a = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    y = _mlp_xla(a, w1, b1, w2, b2)
    return x + ls2.astype(x.dtype) * y


@jax.custom_vjp
def fused_mlp_ln(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                 w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                 b2: jnp.ndarray, ls2: jnp.ndarray) -> jnp.ndarray:
    """x + ls2 * MLP(LN(x)) — Pallas on TPU for well-shaped inputs, XLA
    elsewhere. Pass ls2=ones for modules without LayerScale."""
    c = x.shape[-1]
    hidden = w1.shape[1]
    if (jax.default_backend() == "tpu" and c % 128 == 0 and hidden % 128 == 0
            and x.size // c >= 8):
        m = x.size // c
        rows = _block_rows(m, c, hidden, x.dtype.itemsize)
        if m % rows == 0:
            out = fused_mlp_ln_pallas(x.reshape(m, c), gamma, beta,
                                      w1, b1, w2, b2, ls2)
            return out.reshape(x.shape)
    return _mlp_ln_xla(x, gamma, beta, w1, b1, w2, b2, ls2)


def _fused_mlp_ln_fwd(x, gamma, beta, w1, b1, w2, b2, ls2):
    return fused_mlp_ln(x, gamma, beta, w1, b1, w2, b2, ls2), (
        x, gamma, beta, w1, b1, w2, b2, ls2)


def _fused_mlp_ln_bwd(residuals, g):
    _, vjp = jax.vjp(_mlp_ln_xla, *residuals)
    return vjp(g)


fused_mlp_ln.defvjp(_fused_mlp_ln_fwd, _fused_mlp_ln_bwd)


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
