"""Fast transcendental approximations for the TPU VPU hot path.

XLA's ``sin`` lowering on TPU performs full infinite-range Payne-Hanek
reduction and a high-degree polynomial; measured on a v5e it costs more
than the *entire rest of the training step* for a SIREN trunk
(8x512 sin activations per point: 615 ms/step exact vs 308 ms/step with
this approximation at batch 8192, identical loss trajectory to 4 decimals).

``fast_sin`` replaces it on the SIREN activation path
(ref: baseline/models/commons.py:21-27 ``Siren`` = sin(w0*x)):

- Cody-Waite two-term range reduction to [-pi, pi] (exact for the argument
  magnitudes a SIREN trunk produces, |x| <~ 1e3),
- quadrant fold to [-pi/2, pi/2],
- odd minimax polynomial (degree 7; degree 5 in :func:`fast_sin5`) in the
  reduced argument.

Max absolute error ~2e-6 over [-100, 100] (see tests/test_fastmath.py),
two orders of magnitude inside the 1e-4 golden-parity tolerance used
against the PyTorch reference. Gradients are the exact autodiff derivative
of the approximant itself (round() has zero gradient, so the reduction is
transparent), which keeps forward/backward mutually consistent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 2*pi split so that PI2_HI is exactly representable in float32 and the
# product n*PI2_HI is exact for |n| < 2^16 (Cody-Waite reduction).
_PI2_HI = 6.28125
_PI2_LO = 2.0 * np.pi - _PI2_HI
_INV_PI2 = 1.0 / (2.0 * np.pi)
_HALF_PI = np.pi / 2.0

# Odd polynomial sin(x) ~ x + x^3 * P(x^2), valid on the FULL [-pi/2, pi/2]
# fold range: MINIMAX degree 7 (Remez-fitted over the fold; max abs error
# 1.75e-6 in f32 — at the overall fast_sin error budget, two Horner steps
# cheaper than the Taylor-x^11 kernel it replaced). NB Taylor coefficients
# of the same degree hit 1.6e-4 at +-pi/2 and the classic Cephes kernel is
# only valid on [-pi/4, pi/4] (7e-5 at +-pi/2) — neither is a drop-in.
_S1 = -1.666516854544e-01
_S2 = 8.305977379154e-03
_S3 = -1.831411277453e-04


# Degree-5 variant for the bf16 path: minimax (IRLS-fitted) over the fold,
# max abs error 1.1e-4 — 30x bf16's own rounding step (~4e-3) below it, so
# on bf16 activations the extra error is invisible. One Horner step and one
# reduction fma cheaper than the degree-7 kernel.
_Q1 = -1.660786383418e-01
_Q2 = 7.633781238515e-03

# Single-float 2*pi for the one-term reduction used by fast_sin5: the
# rounding error is |n| * 2.4e-7, i.e. <= 4e-5 for the |x| <= ~1e3 SIREN
# pre-activation range — inside the poly5 error budget.
_PI2_F32 = np.float32(2.0 * np.pi)


def _sin_poly(x, two_term_reduction: bool, degree7: bool):
    """Shared reduce -> fold -> Horner body for the three sine engines.

    One definition so a coefficient or fold fix cannot silently diverge
    between engines (the Pallas kernels parameterise the same way,
    ops/pallas/trunk.py). The branches are Python-static: each engine
    traces to exactly the ops it always had, in the same order.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = jnp.round(xf * _INV_PI2)
    if two_term_reduction:  # Cody-Waite: exact for |n| < 2^16
        r = xf - n * _PI2_HI
        r = r - n * _PI2_LO
    else:  # one fma cheaper; rounding error |n| * 2.4e-7
        r = xf - n * _PI2_F32
    # fold [-pi, pi] -> [-pi/2, pi/2]: sin(pi - r) = sin(r)
    r = jnp.where(r > _HALF_PI, np.pi - r, r)
    r = jnp.where(r < -_HALF_PI, -np.pi - r, r)
    r2 = r * r
    if degree7:
        p = _S3
        p = p * r2 + _S2
        p = p * r2 + _S1
    else:
        p = _Q2 * r2 + _Q1
    return (r + r * r2 * p).astype(dtype)


def fast_sin(x):
    """sin(x) to ~2e-6 abs error for |x| <= ~1e3, ~4x cheaper than XLA's
    sin on the TPU VPU (``sin_impl="poly"``, the production default —
    the degree-5/one-term variants below measured a small but consistent
    DSM-MAE cost when TRAINED with, docs/performance.md "quality gate").
    Computes in the input dtype's promotion with f32 constants."""
    return _sin_poly(x, two_term_reduction=True, degree7=True)


def fast_sin5(x):
    """sin(x) to ~1.5e-4 abs error for |x| <= ~1e3: one-term range
    reduction + degree-5 minimax fold kernel. Two VPU fmas shorter than
    :func:`fast_sin` (``sin_impl="poly5"``, opt-in)."""
    return _sin_poly(x, two_term_reduction=False, degree7=False)


def fast_sin7f(x):
    """sin(x) via the ONE-term range reduction + the DEGREE-7 fold kernel
    (``sin_impl="poly7f"``): one reduction fma cheaper than :func:`fast_sin`.

    Error budget: the single-float reduction contributes |n| * 2.4e-7
    (measured 5.6e-5 max at |x| = 1e3, ~4e-6 for the |x| <~ 50 bulk of
    SIREN pre-activations) on top of the kernel's 1.75e-6. Gate verdict
    (n=4 paired seeds, 2026-08-19): stays OPT-IN for training — one seed's
    converged DSM-MAE lands outside the poly spread and the mean shifts
    +0.08 m — but the eval-time swap matrix shows engine choice is
    metric-free on trained checkpoints, so inference may use it freely."""
    return _sin_poly(x, two_term_reduction=False, degree7=True)
