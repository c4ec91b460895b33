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
* bf16 compute (default "tanh"): the tanh-form GELU in logistic
  coordinates on Mosaic's NATIVE sigmoid — x * sigma(c1*x + c3*x^3), 5
  VPU ops on the hidden width, no tail handling. Max abs deviation from
  exact erf 4.8e-4, ~8x below the bf16 rounding of the following fc2 dot.
  An elementwise VPU op over the 4x-wide f32 hidden costs about as much
  as the whole fc1 matmul (measured round 3) — GELU op count is the
  kernel's dominant term, and this swap bought +4.4% whole-model forward
  (868 -> 906 clips/s at batch 128). KASF_GELU=poly keeps the previous
  14-op odd polynomial (div/exp-free, max err 1.27e-4, linear/zero tails
  outside |x|<=4) for A/B.

Differentiable: pallas_call has no autodiff rule, so `fused_mlp` carries a
custom VJP that recomputes the backward through the XLA formulation
(residuals are just x and the weights). The trunk's training path keeps
the plain XLA mlp anyway (its remat policy saves the XLA hidden by name);
this kernel serves the inference/serving path.
"""

from __future__ import annotations

import functools
import math
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
    For bf16 activations only.

    Measured (v5e, in-model): this form 926 clips/s @128; the
    algebraically-identical logistic form x*sigma(2w) 910 — lax.logistic
    lowers to exp+divide in Mosaic, jnp.tanh is the native unit. Keep tanh."""
    s = x * x
    u = jnp.float32(0.7978845608 * 0.044715) * s + jnp.float32(0.7978845608)
    return 0.5 * x * (1.0 + jnp.tanh(x * u))


# bf16-path GELU evaluation: "tanh" (native-tanh form, ~6 VPU ops) vs
# "poly" (14-op odd polynomial). The GELU over the 4x-wide hidden is the
# kernel's dominant VPU term (module docstring) — this is the A/B for it.
# Read at call (trace) time — docs/KNOBS.md.
def _gelu_impl() -> str:
    return os.environ.get("KASF_GELU", "tanh")


def _gelu2_tanh_f32(x: jnp.ndarray) -> jnp.ndarray:
    """2*gelu(x) in tanh form: x + x*tanh(x*u) — the 0.5 is folded into a
    pre-halved w2 by the kernel wrappers, saving two VPU ops (the 1+t add
    and the 0.5 multiply become one fused multiply-add) on the kernel's
    dominant term, the elementwise chain over the 4x-wide hidden."""
    s = x * x
    u = jnp.float32(0.7978845608 * 0.044715) * s + jnp.float32(0.7978845608)
    return x + x * jnp.tanh(x * u)


_GELU2_POLY_COEF = tuple(2.0 * c for c in _GELU_POLY_COEF)


def _gelu2_poly_f32(x: jnp.ndarray) -> jnp.ndarray:
    """2*gelu(x), polynomial form: coefficients pre-doubled, tails 2x/0."""
    s = x * x
    q = jnp.float32(_GELU2_POLY_COEF[-1])
    for c in _GELU2_POLY_COEF[-2::-1]:
        q = q * s + jnp.float32(c)
    core = x + s * q
    b = jnp.float32(_GELU_POLY_B)
    return jnp.where(x > b, x + x, jnp.where(x < -b, jnp.float32(0.0), core))


def _gelu_bf16(x: jnp.ndarray) -> jnp.ndarray:
    return _gelu_tanh_f32(x) if _gelu_impl() == "tanh" else _gelu_poly_f32(x)


def _gelu2_bf16(x: jnp.ndarray) -> jnp.ndarray:
    return _gelu2_tanh_f32(x) if _gelu_impl() == "tanh" else _gelu2_poly_f32(x)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # GELU on the f32 accumulator, then one rounding to the compute dtype
    # — the same rounding points as the XLA formulation. bf16 compute uses
    # the cheap polynomial (error sub-rounding) with the 0.5 factor folded
    # into the pre-halved w2 (see wrapper); f32 keeps exact erf.
    gelu_fn = _gelu2_bf16 if x.dtype == jnp.bfloat16 else _gelu_exact_f32
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
    if rows == 0 or m % rows:
        raise ValueError(f"no row block divides M={m}")
    w1 = w1.astype(x.dtype)
    # bf16 path: the kernel computes 2*gelu; halving w2 restores the 0.5
    # exactly (a pure exponent shift, no rounding)
    w2 = (w2 * 0.5 if x.dtype == jnp.bfloat16 else w2).astype(x.dtype)
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
    # bf16: 2*gelu against the wrapper's pre-halved w2 (see _mlp_kernel)
    gelu_fn = _gelu2_bf16 if x.dtype == jnp.bfloat16 else _gelu_exact_f32
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
    if rows == 0 or m % rows:
        raise ValueError(f"no row block divides M={m}")
    w1 = w1.astype(x.dtype)
    # bf16 path computes 2*gelu; halve w2 (exact exponent shift)
    w2 = (w2 * 0.5 if x.dtype == jnp.bfloat16 else w2).astype(x.dtype)
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


def _gelu_tanh_grad_f32(x: jnp.ndarray, sig: jnp.ndarray) -> jnp.ndarray:
    """d/dx [x * sigma(u(x))], u = c1 x + c3 x^3, given sig = sigma(u(x))
    from the recomputed forward: sig + x*sig*(1-sig)*(c1 + 3 c3 x^2)."""
    c1 = jnp.float32(2 * 0.7978845608)
    c3 = jnp.float32(2 * 0.7978845608 * 0.044715)
    up = jnp.float32(3) * c3 * (x * x) + c1
    return sig + x * (sig * (1.0 - sig)) * up


def _gelu_exact_grad_f32(x: jnp.ndarray) -> jnp.ndarray:
    """d/dx gelu(x) = Phi(x) + x phi(x) (exact-erf form, f32)."""
    phi = jnp.exp(-0.5 * x * x) * jnp.float32(1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf_f32(x * (2.0 ** -0.5)))
    return cdf + x * phi


def _mlp_ln_bwd_kernel(x_ref, g_ref, gam_ref, bet_ref, w1_ref, b1_ref,
                       w2_ref, b2_ref, ls_ref,
                       dx_ref, dgam_ref, dbet_ref, dw1_ref, db1_ref,
                       dw2_ref, db2_ref, dls_ref, *, eps: float):
    """Backward of the LN-folded MLP tail, entirely in VMEM.

    Per row block: recompute LN -> fc1 -> GELU -> fc2 (flash-style — no
    hidden is ever saved to HBM), then produce dx for the block and
    ACCUMULATE the parameter gradients across grid steps (their BlockSpecs
    map every step to the same block, so they stay VMEM-resident; zeroed at
    step 0). This replaces XLA's tail backward, which at batch 128 paid
    ~9.4 GB of saved-hidden HBM traffic plus thin-K replay matmuls — the
    train step's dominant term (281 of 710 ms, docs/ROUND_NOTES.md).
    """
    i = pl.program_id(0)
    f32 = jnp.float32
    x = x_ref[...]
    xf = x.astype(f32)
    gf = g_ref[...].astype(f32)
    bf16 = x.dtype == jnp.bfloat16

    # --- recompute forward
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    gam = gam_ref[...].astype(f32)
    a = (xhat * gam + bet_ref[...].astype(f32)).astype(x.dtype)
    z = jax.lax.dot_general(a, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    z = z + b1_ref[...].astype(f32)
    if bf16:
        s = z * z
        u = jnp.float32(0.7978845608 * 0.044715) * s + jnp.float32(
            0.7978845608)
        # native tanh (lax.logistic lowers to exp+divide — see
        # _gelu_tanh_f32); sigma(2w) = (1+tanh(w))/2 feeds the derivative
        sig = 0.5 * (1.0 + jnp.tanh(z * u))
        h = (z * sig).astype(x.dtype)
        gp = _gelu_tanh_grad_f32(z, sig)
    else:
        h = _gelu_exact_f32(z).astype(x.dtype)
        gp = _gelu_exact_grad_f32(z)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    o = o + b2_ref[...].astype(f32)

    # --- backward
    ls = ls_ref[...].astype(f32)
    do = (gf * ls).astype(x.dtype)  # (R, C)
    # dh = do @ W2^T (contract both lane axes — MXU transposed-rhs form)
    dh = jax.lax.dot_general(do, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)  # (R, H)
    dz = dh * gp
    dzb = dz.astype(x.dtype)
    da = jax.lax.dot_general(dzb, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)  # (R, C)
    dxhat = da * gam
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = gf + rstd * (dxhat - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # --- parameter gradients, accumulated across the grid
    @pl.when(i == 0)
    def _init():
        dgam_ref[...] = jnp.zeros_like(dgam_ref)
        dbet_ref[...] = jnp.zeros_like(dbet_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)

    dgam_ref[...] += jnp.sum(da * xhat, axis=0, keepdims=True)
    dbet_ref[...] += jnp.sum(da, axis=0, keepdims=True)
    dls_ref[...] += jnp.sum(gf * o, axis=0, keepdims=True)
    db2_ref[...] += jnp.sum(do.astype(f32), axis=0, keepdims=True)
    db1_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    # dW2 = h^T do, dW1 = a^T dz — fat-K (rows) dots, f32 accumulation
    dw2_ref[...] += jax.lax.dot_general(
        h, do, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dw1_ref[...] += jax.lax.dot_general(
        a, dzb, (((0,), (0,)), ((), ())), preferred_element_type=f32)


def _bwd_block_rows(m: int, c: int, hidden: int, itemsize: int,
                    budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Row block for the bwd kernel: x/g/dx + the f32 recompute chain
    (z, gelu', dz, o) + bf16 h/do within budget."""
    per_row = (3 * c * itemsize          # x, g, dx
               + 3 * c * 4               # xf, gf, da/dxhat f32
               + 4 * hidden * 4          # z, gp, dz, o f32
               + 2 * hidden * itemsize)  # h, dzb
    rows = max(8, min(m, budget_bytes // per_row))
    rows -= rows % 8
    while rows >= 8 and m % rows:
        rows -= 8
    return rows


def fused_mlp_ln_bwd_pallas(x, gamma, beta, w1, b1, w2, b2, ls2, g,
                            eps: float = 1e-5, interpret: bool = False):
    """Pallas backward of `fused_mlp_ln`. Returns grads for
    (x, gamma, beta, w1, b1, w2, b2, ls2), primal-shaped."""
    m, c = x.shape
    hidden = w1.shape[1]
    rows = _bwd_block_rows(m, c, hidden, x.dtype.itemsize)
    if rows == 0 or m % rows:
        raise ValueError(f"no row block divides M={m}")
    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    b1c = b1.astype(x.dtype).reshape(1, hidden)
    b2c = b2.astype(x.dtype).reshape(1, c)
    gam = gamma.astype(jnp.float32).reshape(1, c)
    bet = beta.astype(jnp.float32).reshape(1, c)
    ls = ls2.astype(jnp.float32).reshape(1, c)
    xspec = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((m, c), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, c), f32),            # dgamma
        jax.ShapeDtypeStruct((1, c), f32),            # dbeta
        jax.ShapeDtypeStruct((c, hidden), f32),       # dw1
        jax.ShapeDtypeStruct((1, hidden), f32),       # db1
        jax.ShapeDtypeStruct((hidden, c), f32),       # dw2
        jax.ShapeDtypeStruct((1, c), f32),            # db2
        jax.ShapeDtypeStruct((1, c), f32),            # dls2
    ]
    out_specs = [xspec] + [cspec(s) for s in out_shapes[1:]]
    import functools as _ft

    outs = pl.pallas_call(
        _ft.partial(_mlp_ln_bwd_kernel, eps=eps),
        grid=(m // rows,),
        in_specs=[xspec, xspec, cspec(gam), cspec(bet), cspec(w1c),
                  cspec(b1c), cspec(w2c), cspec(b2c), cspec(ls)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, g, gam, bet, w1c, b1c, w2c, b2c, ls)
    dx, dgam, dbet, dw1, db1, dw2, db2, dls = outs
    return (dx, dgam.reshape(-1).astype(gamma.dtype),
            dbet.reshape(-1).astype(beta.dtype), dw1.astype(w1.dtype),
            db1.reshape(-1).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.reshape(-1).astype(b2.dtype),
            dls.reshape(-1).astype(ls2.dtype))


def _mlp_ln_xla(x, gamma, beta, w1, b1, w2, b2, ls2, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    a = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    y = _mlp_xla(a, w1, b1, w2, b2)
    return x + ls2.astype(x.dtype) * y


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_mlp_ln(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                 w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                 b2: jnp.ndarray, ls2: jnp.ndarray,
                 eps: float = 1e-5) -> jnp.ndarray:
    """x + ls2 * MLP(LN(x)) — Pallas on TPU for well-shaped inputs, XLA
    elsewhere. Pass ls2=ones for modules without LayerScale. `eps` is the
    LN epsilon (static; 1e-5 torch default, MixSTE-family blocks use 1e-6)."""
    c = x.shape[-1]
    hidden = w1.shape[1]
    if (jax.default_backend() == "tpu" and c % 128 == 0 and hidden % 128 == 0
            and x.size // c >= 8):
        m = x.size // c
        rows = _block_rows(m, c, hidden, x.dtype.itemsize)
        if rows and m % rows == 0:
            out = fused_mlp_ln_pallas(x.reshape(m, c), gamma, beta,
                                      w1, b1, w2, b2, ls2, eps=eps)
            return out.reshape(x.shape)
    return _mlp_ln_xla(x, gamma, beta, w1, b1, w2, b2, ls2, eps=eps)


def _fused_mlp_ln_fwd(x, gamma, beta, w1, b1, w2, b2, ls2, eps):
    return fused_mlp_ln(x, gamma, beta, w1, b1, w2, b2, ls2, eps), (
        x, gamma, beta, w1, b1, w2, b2, ls2)


def _fused_mlp_ln_bwd(eps, residuals, g):
    x, gamma, beta, w1, b1, w2, b2, ls2 = residuals
    c = x.shape[-1]
    hidden = w1.shape[1]
    if (jax.default_backend() == "tpu" and c % 128 == 0 and hidden % 128 == 0
            and x.size // c >= 8):
        m = x.size // c
        rows = _bwd_block_rows(m, c, hidden, x.dtype.itemsize)
        if rows and m % rows == 0:
            grads = fused_mlp_ln_bwd_pallas(
                x.reshape(m, c), gamma, beta, w1, b1, w2, b2, ls2,
                g.reshape(m, c), eps=eps)
            return (grads[0].reshape(x.shape),) + grads[1:]
    _, vjp = jax.vjp(
        lambda *r: _mlp_ln_xla(*r, eps=eps), *residuals)
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
        if rows and m % rows == 0:
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
