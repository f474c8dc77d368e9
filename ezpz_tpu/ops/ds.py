"""Double-single (two-float) arithmetic for in-kernel f64-grade residuals.

Mosaic (Pallas TPU) cannot lower f64, so the Pallas fleet kernel's coarse
phase runs in f32 and historically handed off to an XLA refinement whose
two mandatory emulated-f64 residual passes dominated the headline runtime.
These primitives represent a value as an UNEVALUATED SUM of two f32s
(hi + lo, |lo| <= ulp(hi)/2 — ~49 bits of precision, comfortably beyond
the 1e-8 inf-norm target on O(1e3) coordinates), using only f32 add/mul:
exactly what Mosaic can lower, keeping the refinement inside VMEM.

Algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP 4.2.2; the float-float arithmetic used throughout GPU/TPU
double-single libraries): two_sum, Dekker split / two_prod, and a
Karp-Markstein-style sqrt refinement.

DS kernel variants (``DS_KERNELS``) mirror the f32 constraint kernels in
``ops.kernels`` for the subset of constraint types whose residuals need
only +, -, *, sqrt. Topologies fully covered by this subset can refine in
the Pallas kernel; others fall back to the XLA refinement path.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp

# Dekker split constant for f32 (24-bit mantissa): 2^12 + 1.
_SPLIT = 4097.0


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """two_sum when |a| >= |b| is guaranteed."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = a * _SPLIT
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (no FMA required)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


DS = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo)


def ds(hi, lo=None) -> DS:
    return (hi, jnp.zeros_like(hi) if lo is None else lo)


def ds_neg(a: DS) -> DS:
    return (-a[0], -a[1])


def ds_add(a: DS, b: DS) -> DS:
    s, e = two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    return quick_two_sum(s, e)


def ds_sub(a: DS, b: DS) -> DS:
    return ds_add(a, ds_neg(b))


def ds_mul(a: DS, b: DS) -> DS:
    p, e = two_prod(a[0], b[0])
    e = e + a[0] * b[1] + a[1] * b[0]
    return quick_two_sum(p, e)


def ds_sqrt(a: DS) -> DS:
    """sqrt with one DS Newton correction; a must be >= 0 (guard first).
    hi = sqrt_f32(a_hi); lo = (a - hi^2) / (2 hi)."""
    hi = jnp.sqrt(a[0])
    # (a_hi - hi*hi) is computed error-free via two_prod.
    p, e = two_prod(hi, hi)
    num = ((a[0] - p) - e) + a[1]
    safe = jnp.where(hi > 0.0, hi, 1.0)
    lo = jnp.where(hi > 0.0, num / (2.0 * safe), jnp.zeros_like(hi))
    return quick_two_sum(hi, lo)


def split_f64(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-side: split f64 array into (hi, lo) f32 pair with hi+lo == x
    to f32-pair precision."""
    hi = jnp.asarray(x, jnp.float64).astype(jnp.float32)
    lo = (jnp.asarray(x, jnp.float64) - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo) -> jnp.ndarray:
    """Host-side: (hi, lo) f32 pair -> f64 value."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


# -- DS constraint kernels ----------------------------------------------------
#
# Signature: fn(v, p) -> (rows, deg) like ops.kernels, but every element of
# ``v``/``p`` and every residual row is a DS pair. ``rows`` is a list (one
# DS pair per residual dimension); deg is a plain bool array.

_EPS2 = 1e-8  # same degeneracy guard as ops.kernels (f32 path)


def dsk_fixed(v: List[DS], p: List[DS]):
    return [ds_sub(v[0], p[0])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_vertical(v, p):
    return [ds_sub(v[0], v[1])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_horizontal(v, p):
    return [ds_sub(v[0], v[1])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_scalar_equal(v, p):
    return [ds_sub(v[0], v[1])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_vertical_distance(v, p):
    return [ds_sub(ds_sub(v[0], v[1]), p[0])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_horizontal_distance(v, p):
    return [ds_sub(ds_sub(v[0], v[1]), p[0])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_points_coincident(v, p):
    return (
        [ds_sub(v[0], v[2]), ds_sub(v[1], v[3])],
        jnp.zeros_like(v[0][0], jnp.bool_),
    )


def dsk_circle_radius(v, p):
    return [ds_sub(v[0], p[0])], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_midpoint(v, p):
    # vars [p0x p0y p1x p1y mx my]: m - (p0 + p1)/2, exactly as k_midpoint.
    half = (jnp.full_like(v[0][0], 0.5), jnp.zeros_like(v[0][0]))
    rx = ds_sub(v[4], ds_mul(ds_add(v[0], v[2]), half))
    ry = ds_sub(v[5], ds_mul(ds_add(v[1], v[3]), half))
    return [rx, ry], jnp.zeros_like(v[0][0], jnp.bool_)


def dsk_distance(v, p):
    """|p0 - p1| - d. The residual VALUE is the true sqrt on every lane
    (the f32 kernel's ``_guard`` only sanitizes the derivative graph; the
    DS path computes no derivatives, so no guard is needed — just clamp
    the tiny-negative rounding case)."""
    dx = ds_sub(v[0], v[2])
    dy = ds_sub(v[1], v[3])
    q = ds_add(ds_mul(dx, dx), ds_mul(dy, dy))
    deg = q[0] < _EPS2
    s = ds_sqrt((jnp.maximum(q[0], 0.0), jnp.where(q[0] > 0, q[1], 0.0)))
    return [ds_sub(s, p[0])], deg


def dsk_distance_var(v, p):
    dx = ds_sub(v[0], v[2])
    dy = ds_sub(v[1], v[3])
    q = ds_add(ds_mul(dx, dx), ds_mul(dy, dy))
    deg = q[0] < _EPS2
    s = ds_sqrt((jnp.maximum(q[0], 0.0), jnp.where(q[0] > 0, q[1], 0.0)))
    r = ds_sub(s, v[4])
    return [r], deg


DS_KERNELS: Dict[str, Callable] = {
    "fixed": dsk_fixed,
    "vertical": dsk_vertical,
    "horizontal": dsk_horizontal,
    "scalar_equal": dsk_scalar_equal,
    "vertical_distance": dsk_vertical_distance,
    "horizontal_distance": dsk_horizontal_distance,
    "points_coincident": dsk_points_coincident,
    "circle_radius": dsk_circle_radius,
    "midpoint": dsk_midpoint,
    "distance": dsk_distance,
    "distance_var": dsk_distance_var,
}
