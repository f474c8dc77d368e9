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

DS kernel variants (``DS_KERNELS``) mirror EVERY f32 constraint kernel in
``ops.kernels`` — +,-,*,/,sqrt,abs primitives cover most; ``ds_sincos``
(error-free pi/2 range reduction + Taylor in DS) covers arc_length; the
piecewise point-arc classification selects branches in plain f32 (it is
piecewise-constant) around full-DS branch values. Every topology can
therefore refine inside the Pallas kernel; ``_ds_instance_list`` still
guards against future kernels without variants.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

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


def ds_div(a: DS, b: DS) -> DS:
    """Long division with one remainder correction: q1 = a_hi/b_hi,
    q2 = (a - q1*b)/b_hi."""
    q1 = a[0] / b[0]
    p, e = two_prod(q1, b[0])
    # a - q1*b in DS (q1*b = (p + e) + q1*b_lo).
    r_hi = ((a[0] - p) - e) + a[1] - q1 * b[1]
    q2 = r_hi / b[0]
    return quick_two_sum(q1, q2)


# pi/2 as a 3-term f32 expansion: the leading error of the two-term split
# is ~1e-14, enough for arguments up to a few revolutions.
_PIO2_HI = np.float32(1.5707964)
_PIO2_MD = np.float32(np.pi / 2 - np.float64(np.float32(1.5707964)))
_PIO2_LO = np.float32(
    np.pi / 2
    - np.float64(np.float32(1.5707964))
    - np.float64(np.float32(np.pi / 2 - np.float64(np.float32(1.5707964)))))

# 1/k! constants as DS pairs (split from f64).
def _const_pair(x: float):
    hi = np.float32(x)
    return hi, np.float32(x - np.float64(hi))


_SIN_COEF = [_const_pair(c) for c in
             (-1.0 / 6, 1.0 / 120, -1.0 / 5040, 1.0 / 362880,
              -1.0 / 39916800, 1.0 / 6227020800)]
_COS_COEF = [_const_pair(c) for c in
             (-0.5, 1.0 / 24, -1.0 / 720, 1.0 / 40320,
              -1.0 / 3628800, 1.0 / 479001600)]


def _poly(y2: DS, coefs) -> DS:
    """Horner in DS over y^2: sum_k coefs[k] * y2^(k+1) + ... nested."""
    hi, lo = coefs[-1]
    acc = (jnp.full_like(y2[0], hi), jnp.full_like(y2[0], lo))
    for chi, clo in reversed(coefs[:-1]):
        c = (jnp.full_like(y2[0], chi), jnp.full_like(y2[0], clo))
        acc = ds_add(c, ds_mul(acc, y2))
    return ds_mul(acc, y2)


def ds_sincos(theta: DS) -> Tuple[DS, DS]:
    """(sin, cos) of a DS angle: 3-term pi/2 range reduction to
    |y| <= pi/4, Taylor in DS (terms to y^13 — beyond the ~49-bit DS
    precision on the reduced range), quadrant unswizzle.

    Accurate to ~1e-13 absolute for |theta| up to a few revolutions —
    the arc-length kernel's alpha = d/r is a single-arc angle."""
    n = jnp.round((theta[0] + theta[1]) * np.float32(2.0 / np.pi))
    # y = theta - n * pi/2. The products n*hi and n*md are NOT exact in
    # f32 (n=3 already needs 26 mantissa bits), so each goes through the
    # error-free two_prod; only the n*lo tail may round (below 1e-13).
    ph, eh = two_prod(n, jnp.full_like(n, _PIO2_HI))
    pm, em = two_prod(n, jnp.full_like(n, _PIO2_MD))
    y = ds_sub(theta, (ph, eh))
    y = ds_sub(y, (pm, em))
    y = ds_sub(y, (n * _PIO2_LO, jnp.zeros_like(n)))
    one = (jnp.ones_like(y[0]), jnp.zeros_like(y[0]))
    y2 = ds_mul(y, y)
    sin_y = ds_add(y, ds_mul(y, _poly(y2, _SIN_COEF)))
    cos_y = ds_add(one, _poly(y2, _COS_COEF))
    # np.int32 literals: under x64 mode a bare 4 promotes to i64, which
    # the Pallas TPU tracer refuses.
    q = jnp.mod(n.astype(jnp.int32), np.int32(4))
    one_i, two_i, three_i = np.int32(1), np.int32(2), np.int32(3)
    swap = (q == one_i) | (q == three_i)
    s_base = _ds_where(swap, cos_y, sin_y)
    c_base = _ds_where(swap, sin_y, cos_y)
    s_neg = (q == two_i) | (q == three_i)
    c_neg = (q == one_i) | (q == two_i)
    sin_t = _ds_where(s_neg, ds_neg(s_base), s_base)
    cos_t = _ds_where(c_neg, ds_neg(c_base), c_base)
    return sin_t, cos_t


def ds_abs(a: DS) -> DS:
    neg = (a[0] + a[1]) < 0.0
    return (jnp.where(neg, -a[0], a[0]), jnp.where(neg, -a[1], a[1]))


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


def _ds_zero_like(t):
    z = jnp.zeros_like(t)
    return (z, z)


def _ds_where(cond, a: DS, b: DS) -> DS:
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def _ds_const(like, val: float) -> DS:
    hi = jnp.full_like(like, val)
    return (hi, jnp.zeros_like(hi))


def _ds_norm2(dx: DS, dy: DS) -> DS:
    return ds_add(ds_mul(dx, dx), ds_mul(dy, dy))


def _safe_q(q: DS, deg) -> DS:
    """Clamp tiny-negative rounding and sanitize degenerate lanes to 1.0
    so sqrt/div never see a bad argument (value discarded on those lanes)."""
    hi = jnp.where(deg, jnp.ones_like(q[0]), jnp.maximum(q[0], 0.0))
    lo = jnp.where(deg | (q[0] <= 0.0), jnp.zeros_like(q[1]), q[1])
    return (hi, lo)


def dsk_lines_equal_length(v, p):
    """|l0| - |l1| — true sqrt on every lane (matches k_lines_equal_length's
    raw value; q >= 0 up to rounding)."""
    q0 = _ds_norm2(ds_sub(v[0], v[2]), ds_sub(v[1], v[3]))
    q1 = _ds_norm2(ds_sub(v[4], v[6]), ds_sub(v[5], v[7]))
    deg = (q0[0] < _EPS2) | (q1[0] < _EPS2)
    s0 = ds_sqrt((jnp.maximum(q0[0], 0.0), jnp.where(q0[0] > 0, q0[1], 0.0)))
    s1 = ds_sqrt((jnp.maximum(q1[0], 0.0), jnp.where(q1[0] > 0, q1[1], 0.0)))
    return [ds_sub(s0, s1)], deg


def dsk_arc(v, p):
    """|s-c| - |e-c| (k_arc)."""
    q0 = _ds_norm2(ds_sub(v[0], v[4]), ds_sub(v[1], v[5]))
    q1 = _ds_norm2(ds_sub(v[2], v[4]), ds_sub(v[3], v[5]))
    deg = (q0[0] <= _EPS2) | (q1[0] <= _EPS2)
    s0 = ds_sqrt((jnp.maximum(q0[0], 0.0), jnp.where(q0[0] > 0, q0[1], 0.0)))
    s1 = ds_sqrt((jnp.maximum(q1[0], 0.0), jnp.where(q1[0] > 0, q1[1], 0.0)))
    return [ds_sub(s0, s1)], deg


def dsk_lines_at_angle(v, p):
    """cross(u, R^-1 v) / ((|u|+|v|)/2); residual 0 on degenerate lanes
    (k_lines_at_angle guards to 0.0)."""
    ux, uy = ds_sub(v[2], v[0]), ds_sub(v[3], v[1])
    vx, vy = ds_sub(v[6], v[4]), ds_sub(v[7], v[5])
    s, c = p[0], p[1]
    qu = _ds_norm2(ux, uy)
    qv = _ds_norm2(vx, vy)
    deg = (qu[0] <= _EPS2) | (qv[0] <= _EPS2)
    lu = ds_sqrt(_safe_q(qu, deg))
    lv = ds_sqrt(_safe_q(qv, deg))
    rvx = ds_add(ds_mul(c, vx), ds_mul(s, vy))
    rvy = ds_sub(ds_mul(c, vy), ds_mul(s, vx))
    cross = ds_sub(ds_mul(ux, rvy), ds_mul(uy, rvx))
    half = _ds_const(ux[0], 0.5)
    res = ds_div(cross, ds_mul(ds_add(lu, lv), half))
    return [_ds_where(deg, _ds_zero_like(res[0]), res)], deg


def dsk_points_at_angle(v, p):
    """(|u| v - |v| R u)/((|u|+|v|)/2), two rows (k_points_at_angle)."""
    ux, uy = ds_sub(v[2], v[0]), ds_sub(v[3], v[1])
    vx, vy = ds_sub(v[4], v[0]), ds_sub(v[5], v[1])
    s, c = p[0], p[1]
    qu = _ds_norm2(ux, uy)
    qv = _ds_norm2(vx, vy)
    deg = (qu[0] <= _EPS2) | (qv[0] <= _EPS2)
    lu = ds_sqrt(_safe_q(qu, deg))
    lv = ds_sqrt(_safe_q(qv, deg))
    rux = ds_sub(ds_mul(c, ux), ds_mul(s, uy))
    ruy = ds_add(ds_mul(s, ux), ds_mul(c, uy))
    half = _ds_const(ux[0], 0.5)
    scale = ds_mul(ds_add(lu, lv), half)
    r0 = ds_div(ds_sub(ds_mul(vx, lu), ds_mul(rux, lv)), scale)
    r1 = ds_div(ds_sub(ds_mul(vy, lu), ds_mul(ruy, lv)), scale)
    z = _ds_zero_like(r0[0])
    return [_ds_where(deg, z, r0), _ds_where(deg, z, r1)], deg


def dsk_point_line_distance(v, p):
    """(A px + B py + C)/hypot(A, B) - d; 0 on degenerate lanes."""
    px, py, p0x, p0y, p1x, p1y = v
    a = ds_sub(p0y, p1y)
    b = ds_sub(p1x, p0x)
    cc = ds_sub(ds_mul(p0x, p1y), ds_mul(p1x, p0y))
    q = _ds_norm2(a, b)
    deg = q[0] < _EPS2
    denom = ds_sqrt(_safe_q(q, deg))
    num = ds_add(ds_add(ds_mul(a, px), ds_mul(b, py)), cc)
    res = ds_sub(ds_div(num, denom), p[0])
    return [_ds_where(deg, _ds_zero_like(res[0]), res)], deg


def dsk_vertical_point_line_distance(v, p):
    """ay - py - (dy/dx)(ax - px) - d; 0 on degenerate lanes (vertical or
    zero-length line)."""
    ax, ay, px, py, qx, qy = v
    dx, dy = ds_sub(qx, px), ds_sub(qy, py)
    norm = _ds_norm2(dx, dy)
    deg = (jnp.abs(dx[0] + dx[1]) <= np.float32(1e-4)) | (norm[0] <= _EPS2)
    dx_s = _ds_where(deg, _ds_const(dx[0], 1.0), dx)
    res = ds_sub(
        ds_sub(ds_sub(ay, py), ds_mul(ds_div(dy, dx_s), ds_sub(ax, px))),
        p[0])
    return [_ds_where(deg, _ds_zero_like(res[0]), res)], deg


def dsk_horizontal_point_line_distance(v, p):
    ax, ay, px, py, qx, qy = v
    dx, dy = ds_sub(qx, px), ds_sub(qy, py)
    norm = _ds_norm2(dx, dy)
    deg = (jnp.abs(dy[0] + dy[1]) <= np.float32(1e-4)) | (norm[0] <= _EPS2)
    dy_s = _ds_where(deg, _ds_const(dy[0], 1.0), dy)
    res = ds_sub(
        ds_sub(ds_sub(ax, px), ds_mul(ds_div(dx, dy_s), ds_sub(ay, py))),
        p[0])
    return [_ds_where(deg, _ds_zero_like(res[0]), res)], deg


def dsk_symmetric(v, p):
    """reflect(a-p, q-p) - b + p, two rows (k_symmetric, incl. its
    documented zero-guarded deviation from the reference's NaN)."""
    px, py, qx, qy, ax, ay, bx, by = v
    dx, dy = ds_sub(qx, px), ds_sub(qy, py)
    r = _ds_norm2(dx, dy)
    deg = (r[0] * r[0]) < np.float32(1e-4)
    # Value parity with k_symmetric: the f32 kernel's raw (degenerate-branch)
    # value divides by the TRUE |q-p|^2, guarding only exact zero
    # (kernels.py r_z). Guarding on every deg lane would change the residual
    # value and the derived satisfaction bit on degenerate-but-nonzero lanes.
    r_s = _ds_where(r[0] == 0.0, _ds_const(r[0], 1.0), r)
    sx, sy = ds_sub(ax, px), ds_sub(ay, py)
    dot = ds_add(ds_mul(sx, dx), ds_mul(sy, dy))
    two = _ds_const(dx[0], 2.0)
    scale = ds_div(ds_mul(two, dot), r_s)
    refx = ds_sub(ds_mul(dx, scale), sx)
    refy = ds_sub(ds_mul(dy, scale), sy)
    r0 = ds_add(ds_sub(refx, bx), px)
    r1 = ds_add(ds_sub(refy, by), py)
    return [r0, r1], deg


def dsk_line_tangent_circle(v, p):
    """side * cross(p1-p0, c-p0)/|p1-p0| - |r|; 0 on degenerate lanes."""
    p0x, p0y, p1x, p1y, cx, cy, r = v
    side = p[0]  # exactly +-1: ds_mul is exact here
    ux, uy = ds_sub(p1x, p0x), ds_sub(p1y, p0y)
    q = _ds_norm2(ux, uy)
    deg = q[0] <= _EPS2
    mag = ds_sqrt(_safe_q(q, deg))
    vx, vy = ds_sub(cx, p0x), ds_sub(cy, p0y)
    cross = ds_sub(ds_mul(ux, vy), ds_mul(uy, vx))
    cen = ds_div(ds_mul(side, cross), mag)
    res = ds_sub(cen, ds_abs(r))
    return [_ds_where(deg, _ds_zero_like(res[0]), res)], deg


def dsk_circle_tangent_circle(v, p):
    """interior ? ||ra|-|rb|| - d : |ra|+|rb| - d; d is the true center
    distance on every lane (k_circle_tangent_circle's raw value)."""
    ax, ay, ar, bx, by, br = v
    interior = p[0][0]  # 1.0/0.0 flag: hi part suffices
    q = _ds_norm2(ds_sub(ax, bx), ds_sub(ay, by))
    deg = q[0] <= _EPS2
    dist = ds_sqrt((jnp.maximum(q[0], 0.0), jnp.where(q[0] > 0, q[1], 0.0)))
    ra, rb = ds_abs(ar), ds_abs(br)
    r_int = ds_abs(ds_sub(ra, rb))
    r_ext = ds_add(ra, rb)
    base = _ds_where(interior > 0.5, r_int, r_ext)
    return [ds_sub(base, dist)], deg


def dsk_point_arc_coincident(v, p):
    """Piecewise point-on-arc residual (k_point_arc_coincident). The
    branch CLASSIFICATION (interior-of-span via CCW angles; nearest
    endpoint) is piecewise-constant and only selects which residual to
    return — it runs in plain f32 on the hi+lo sums (the reference's own
    classification is just 'the value at the evaluation point',
    constraints.rs:2593-2606). The branch VALUES are full double-single."""
    cx, cy, sx, sy, ex, ey, px, py = v
    sxr, syr = ds_sub(sx, cx), ds_sub(sy, cy)
    exr, eyr = ds_sub(ex, cx), ds_sub(ey, cy)
    pxr, pyr = ds_sub(px, cx), ds_sub(py, cy)
    qs = _ds_norm2(sxr, syr)
    qe = _ds_norm2(exr, eyr)
    qp = _ds_norm2(pxr, pyr)
    deg = (qs[0] < _EPS2) | (qe[0] < _EPS2) | (qp[0] < _EPS2)
    r = ds_sqrt(_safe_q(qs, deg))
    r_e = ds_sqrt(_safe_q(qe, deg))
    r_p = ds_sqrt(_safe_q(qp, deg))
    scale_e = ds_div(r, r_e)
    epx, epy = ds_mul(exr, scale_e), ds_mul(eyr, scale_e)

    def f(a):  # f32 collapse for the branch selector
        return a[0] + a[1]

    from .kernels import ccw_angle_less

    interior = ccw_angle_less(f(sxr), f(syr), f(pxr), f(pyr), f(epx), f(epy))
    d_end2 = (f(epx) - f(pxr)) ** 2 + (f(epy) - f(pyr)) ** 2
    d_start2 = (f(sxr) - f(pxr)) ** 2 + (f(syr) - f(pyr)) ** 2
    nearest_end = d_end2 < d_start2

    sc = ds_sub(ds_div(r, r_p), _ds_const(r[0], 1.0))
    f_int = (ds_mul(pxr, sc), ds_mul(pyr, sc))
    f_end = (ds_sub(epx, pxr), ds_sub(epy, pyr))
    f_start = (ds_sub(sxr, pxr), ds_sub(syr, pyr))
    r0 = _ds_where(interior, f_int[0],
                   _ds_where(nearest_end, f_end[0], f_start[0]))
    r1 = _ds_where(interior, f_int[1],
                   _ds_where(nearest_end, f_end[1], f_start[1]))
    z = _ds_zero_like(r0[0])
    return [_ds_where(deg, z, r0), _ds_where(deg, z, r1)], deg


def dsk_arc_length(v, p):
    """(b - c) - R(d/|a-c|)(a - c), two rows (k_arc_length) — the last
    kernel to get a DS variant, via ``ds_sincos``."""
    cx, cy, ax, ay, bx, by = v
    d = p[0]
    ux, uy = ds_sub(ax, cx), ds_sub(ay, cy)
    q = _ds_norm2(ux, uy)
    deg = q[0] <= _EPS2
    r = ds_sqrt(_safe_q(q, deg))
    alpha = ds_div(d, r)
    sa, ca = ds_sincos(alpha)
    rux = ds_sub(ds_mul(ca, ux), ds_mul(sa, uy))
    ruy = ds_add(ds_mul(sa, ux), ds_mul(ca, uy))
    r0 = ds_sub(ds_sub(bx, cx), rux)
    r1 = ds_sub(ds_sub(by, cy), ruy)
    z = _ds_zero_like(r0[0])
    return [_ds_where(deg, z, r0), _ds_where(deg, z, r1)], deg


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
    "lines_equal_length": dsk_lines_equal_length,
    "arc": dsk_arc,
    "lines_at_angle": dsk_lines_at_angle,
    "points_at_angle": dsk_points_at_angle,
    "point_line_distance": dsk_point_line_distance,
    "vertical_point_line_distance": dsk_vertical_point_line_distance,
    "horizontal_point_line_distance": dsk_horizontal_point_line_distance,
    "symmetric": dsk_symmetric,
    "line_tangent_circle": dsk_line_tangent_circle,
    "circle_tangent_circle": dsk_circle_tangent_circle,
    "point_arc_coincident": dsk_point_arc_coincident,
    "arc_length": dsk_arc_length,
}
