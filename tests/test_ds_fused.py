"""Double-single arithmetic (ops/ds.py) + the fused Pallas fleet solver
(coarse f32 + in-kernel DS refinement, interpret mode on CPU).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ezpz_tpu  # noqa: F401
from ezpz_tpu.batch import BatchSolver
from ezpz_tpu.config import Config
from ezpz_tpu.constraints import Constraint
from ezpz_tpu.datatypes import DatumLineSegment, DatumPoint
from ezpz_tpu.models.compiled import compile_system
from ezpz_tpu.ops import ds as D

from .test_unrolled_pallas import _mixed_system


# -- primitives ---------------------------------------------------------------


def test_ds_add_mul_sqrt_accuracy():
    rng = np.random.default_rng(0)
    a64 = rng.uniform(-600, 600, 512)
    b64 = rng.uniform(-600, 600, 512)
    a = D.split_f64(a64)
    b = D.split_f64(b64)
    assert np.max(np.abs(np.asarray(D.join_f64(*a)) - a64)) < 1e-11
    s = D.ds_add(a, b)
    assert np.max(np.abs(np.asarray(D.join_f64(*s)) - (a64 + b64))) < 1e-10
    m = D.ds_mul(a, b)
    rel = np.abs(np.asarray(D.join_f64(*m)) - a64 * b64) / np.abs(a64 * b64)
    assert np.max(rel) < 1e-13
    q = D.split_f64(np.abs(a64))
    r = D.ds_sqrt(q)
    rel = np.abs(np.asarray(D.join_f64(*r)) - np.sqrt(np.abs(a64)))
    assert np.max(rel / np.sqrt(np.abs(a64))) < 1e-13


def test_ds_sincos_multi_revolution():
    """ds_sincos over +-20 rad (several revolutions): exercises quadrant
    indices |n| > 4, where a wrong modulus would misplace quadrants (a
    mutation of mod(n, 4) survived the original +-7 rad range)."""
    rng = np.random.default_rng(6)
    th = rng.uniform(-20, 20, 2048)
    s, c = D.ds_sincos(D.split_f64(th))
    assert np.max(np.abs(np.asarray(D.join_f64(*s)) - np.sin(th))) < 1e-11
    assert np.max(np.abs(np.asarray(D.join_f64(*c)) - np.cos(th))) < 1e-11


def test_ds_distance_kernel_large_coordinates():
    """|p0-p1| - d evaluated at coordinate scale 600 stays accurate to
    ~1e-11 absolute — the regime where plain f32 has ~4e-5 error."""
    rng = np.random.default_rng(1)
    x0 = rng.uniform(-600, 600, 256)
    y0 = rng.uniform(-600, 600, 256)
    x1 = x0 + rng.uniform(-5, 5, 256)
    y1 = y0 + rng.uniform(-5, 5, 256)
    d = np.hypot(x0 - x1, y0 - y1) + rng.uniform(-1e-9, 1e-9, 256)
    v = [D.split_f64(t) for t in (x0, y0, x1, y1)]
    rows, deg = D.dsk_distance(v, [D.split_f64(d)])
    res = np.asarray(D.join_f64(*rows[0]))
    ref = np.hypot(x0 - x1, y0 - y1) - d
    assert np.max(np.abs(res - ref)) < 1e-10
    assert not bool(np.asarray(deg).any())


def test_ds_kernels_match_f64_kernels():
    """Every DS kernel variant agrees with its f64 kernel on random inputs
    (the DS analog of the FD-vs-autodiff invariant)."""
    from ezpz_tpu.ops.ds import DS_KERNELS
    from ezpz_tpu.ops.kernels import KERNELS

    rng = np.random.default_rng(2)
    for name, dsfn in DS_KERNELS.items():
        spec = KERNELS[name]
        v64 = [rng.uniform(-50, 50, 64) for _ in range(spec.nvars)]
        p64 = [rng.uniform(0.5, 20, 64) for _ in range(spec.nparams)]
        ref, _deg = jax.vmap(
            lambda *a: spec.fn(a[: spec.nvars], a[spec.nvars:])
        )(*[jnp.asarray(t) for t in (v64 + p64)])
        rows, _dg = dsfn([D.split_f64(t) for t in v64],
                         [D.split_f64(t) for t in p64])
        assert len(rows) == spec.dim, name
        for di in range(spec.dim):
            got = np.asarray(D.join_f64(*rows[di]))
            np.testing.assert_allclose(got, np.asarray(ref)[:, di],
                                       atol=1e-10, err_msg=name)


def test_ds_degeneracy_threshold_boundary():
    """The deg guard fires at |gap|^2 <= ~1e-8 = EPSILON^2 — the SAME
    threshold as the f32/f64 kernels (kernels._EPS2). Probe both sides of
    the boundary: a 3.1e-4-long segment (q ~ 9.6e-8, inside the decade
    ABOVE the threshold) must NOT flag, a 5e-5-long one (q ~ 2.5e-9) must.
    Kills the mutation-found gap where _EPS2 could drift a decade without
    any test noticing (mutants ds.py '1e-08 -> 1e-07')."""
    from ezpz_tpu.ops.kernels import KERNELS

    for gap, want_deg in ((3.1e-4, False), (5e-5, True)):
        x0 = np.array([1.0, 2.5])
        y0 = np.array([-0.5, 0.25])
        x1, y1 = x0 + gap, y0
        d = np.hypot(x0 - x1, y0 - y1)
        v64 = [x0, y0, x1, y1]
        p64 = [d]
        _ref, dg64 = jax.vmap(
            lambda *a: KERNELS["distance"].fn(a[:4], a[4:])
        )(*[jnp.asarray(t) for t in (v64 + p64)])
        rows, dg = D.dsk_distance(
            [D.split_f64(t) for t in v64], [D.split_f64(t) for t in p64])
        assert bool(np.asarray(dg).all()) == want_deg
        # and the DS flag agrees with the f64 kernel's flag
        assert np.array_equal(np.asarray(dg), np.asarray(dg64))


def test_ds_sincos_reduced_range_extremes():
    """ds_sincos at |reduced y| ~ pi/4 — where the HIGHEST-order Taylor
    terms contribute most (x^13/13! ~ 7e-12 at y=pi/4). True error is
    <= 4e-13 (measured); assert 2e-12 so a perturbed top coefficient
    (mutants: 1/13! scaled 10x -> ~6e-12 error) cannot pass."""
    th = np.array([np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 2.35619449,
                   7.0685835, 0.785398, 10.9955743, -0.7853982, 3.9269908])
    s, c = D.ds_sincos(D.split_f64(th))
    assert np.max(np.abs(np.asarray(D.join_f64(*s)) - np.sin(th))) < 2e-12
    assert np.max(np.abs(np.asarray(D.join_f64(*c)) - np.cos(th))) < 2e-12


def test_ds_point_line_distance_deg_threshold_window():
    """The vertical/horizontal point-line-distance deg guard fires at
    |dx| (resp |dy|) <= 1e-4 — EPSILON, same as kernels.py:259. A line
    with slope component 5e-4 (inside the decade above the guard) must
    NOT flag and must produce the f64 kernel's residual; 5e-5 must flag.
    Kills the '0.0001 -> 0.001' threshold mutants."""
    from ezpz_tpu.ops.kernels import KERNELS

    for name in ("vertical_point_line_distance",
                 "horizontal_point_line_distance"):
        spec = KERNELS[name]
        for off, want_deg in ((5e-4, False), (5e-5, True)):
            # line from (0,0) to (off, 1) [vertical variant: dx = off] or
            # to (1, off) [horizontal variant: dy = off]
            if name.startswith("vertical"):
                qx, qy = off, 1.0
            else:
                qx, qy = 1.0, off
            v64 = [np.array([0.3]), np.array([0.7]), np.array([0.0]),
                   np.array([0.0]), np.array([qx]), np.array([qy])]
            p64 = [np.array([0.25])]
            ref, dg64 = jax.vmap(
                lambda *a: spec.fn(a[:6], a[6:])
            )(*[jnp.asarray(t) for t in (v64 + p64)])
            rows, dg = D.DS_KERNELS[name](
                [D.split_f64(t) for t in v64], [D.split_f64(t) for t in p64])
            assert bool(np.asarray(dg)[0]) == want_deg, (name, off)
            assert np.array_equal(np.asarray(dg), np.asarray(dg64)), name
            got = np.asarray(D.join_f64(*rows[0]))
            np.testing.assert_allclose(got, np.asarray(ref)[:, 0],
                                       atol=1e-10, err_msg=name)


def test_ds_symmetric_degenerate_nonzero_matches_f64_kernel():
    """On degenerate-but-NONZERO mirror lines (|q-p|^4 < EPSILON, q != p)
    the f32/f64 kernel's residual VALUE divides by the true |q-p|^2 (only
    exact zero is guarded). The DS variant must match — substituting
    denominator 1.0 on deg lanes would change the fused path's residual and
    satisfaction on flagged-degenerate lanes (ADVICE r2 finding 1)."""
    from ezpz_tpu.ops.kernels import KERNELS

    rng = np.random.default_rng(7)
    n = 64
    px, py = rng.uniform(-5, 5, n), rng.uniform(-5, 5, n)
    # |q - p| ~ 0.05: r = 2.5e-3, r^2 = 6.25e-6 < 1e-4 -> degenerate flag,
    # but the true denominator is far from zero.
    th = rng.uniform(0, 2 * np.pi, n)
    qx, qy = px + 0.05 * np.cos(th), py + 0.05 * np.sin(th)
    ax, ay = rng.uniform(-5, 5, n), rng.uniform(-5, 5, n)
    bx, by = rng.uniform(-5, 5, n), rng.uniform(-5, 5, n)
    v64 = [px, py, qx, qy, ax, ay, bx, by]

    spec = KERNELS["symmetric"]
    ref, deg_ref = jax.vmap(lambda *a: spec.fn(a, ()))(
        *[jnp.asarray(t) for t in v64])
    rows, deg = D.dsk_symmetric([D.split_f64(t) for t in v64], [])
    assert bool(np.asarray(deg_ref).all()) and bool(np.asarray(deg).all())
    for di in range(2):
        got = np.asarray(D.join_f64(*rows[di]))
        # f64 kernel vs DS: agreement well below f32 round-off on the
        # ~1/r-amplified values proves the same denominator is used.
        np.testing.assert_allclose(got, np.asarray(ref)[:, di],
                                   rtol=1e-6, atol=1e-6)


# -- the fused solver ---------------------------------------------------------


def _pars_for(system, B):
    return tuple(
        jnp.asarray(np.tile(np.asarray(b.par), (B, 1, 1)))
        for b in system.blocks
    )


def test_ds_symmetric_deg_threshold_window():
    """The symmetric deg guard fires at |q-p|^4 < EPSILON, i.e.
    |q-p| < 0.1 (the reference compares the SQUARED squared length,
    constraints.rs:2378-2383). A mirror line of length 0.13 — inside the
    window a decade-perturbed threshold would misflag — must NOT flag,
    agreeing with the f64 kernel."""
    from ezpz_tpu.ops.kernels import KERNELS

    v64 = [np.array([0.0]), np.array([0.0]),        # p
           np.array([0.13]), np.array([0.0]),       # q: |q-p| = 0.13
           np.array([0.4]), np.array([0.6]),        # a
           np.array([0.4]), np.array([-0.6])]       # b
    _ref, dg64 = jax.vmap(
        lambda *a: KERNELS["symmetric"].fn(a[:8], a[8:])
    )(*[jnp.asarray(t) for t in v64])
    _rows, dg = D.dsk_symmetric([D.split_f64(t) for t in v64], [])
    assert not bool(np.asarray(dg)[0])
    assert np.array_equal(np.asarray(dg), np.asarray(dg64))


def test_fused_matches_mixed_path():
    system = _mixed_system()
    B = 1024
    rng = np.random.default_rng(3)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.02, (B, 7)))
    pars = _pars_for(system, B)

    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fused.solve(x0, pars)
    assert fused._fused_runs, "fused kernel should have been built"
    assert list(fused._fused_runs.values())[0] is not None
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())

    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-7)
    # The DS refinement hits the true 1e-8 residual: against the pure-f64
    # answer the solution is accurate to ~1e-8 coordinates.
    f64 = BatchSolver(system, Config(), batch_params=True).solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(f64.x), atol=1e-6)


def test_fused_large_coordinates_reach_1e8():
    """Coordinates of magnitude ~500: the f32 coarse phase alone cannot
    reach 1e-8 (representation floor ~4e-5); the DS refinement must."""
    p0, p1 = DatumPoint(0, 1), DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(p0.x_id, 500.25),
        Constraint.Fixed(p0.y_id, -317.5),
        Constraint.Distance(p0, p1, 3.0),
        Constraint.Vertical(DatumLineSegment(p0, p1)),
    ]
    system = compile_system(cs, n_vars=4)
    B = 1024
    rng = np.random.default_rng(4)
    base = np.array([500.2, -317.4, 500.3, -314.6])
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.05, (B, 4)))
    pars = _pars_for(system, B)

    out = BatchSolver(system, Config(), batch_params=True, precision="mixed",
                      pallas_fused=True).solve(x0, pars)
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())
    # True f64 residual of the fused answers meets the 1e-8 tolerance.
    r, _deg = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
        jnp.asarray(out.x, jnp.float64), *pars)
    assert float(jnp.max(jnp.abs(r))) <= 1e-8


def test_fused_square_fixture_topology():
    """The `square` golden fixture's topology (lines_at_angle +
    lines_equal_length + fixed/vertical/horizontal — exercises the
    division/rotation DS kernels) solves as a fused fleet and matches the
    plain mixed path."""
    import os

    from ezpz_tpu.textual import Problem

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    txt = open(os.path.join(here, "tests", "cases", "square", "problem.md")).read()
    cs = Problem.from_str(txt).to_constraint_system()
    constraints = [r.constraint for r in cs.constraints]
    x0v = np.zeros(len(cs.initial_guesses))
    for vid, val in cs.initial_guesses:
        x0v[vid] = val
    system = compile_system(constraints, len(x0v))
    B = 1024
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(np.tile(x0v, (B, 1)) + rng.normal(0, 1e-3, (B, len(x0v))))
    pars = _pars_for(system, B)
    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fused.solve(x0, pars)
    assert list(fused._fused_runs.values())[0] is not None, "should be DS-capable"
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())
    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-6)


def test_ccw_angle_less_matches_atan2():
    """The Pallas-safe half-plane classification == the atan2 comparison
    (random vectors; exact 0/pi boundary angles excluded as documented)."""
    from ezpz_tpu.ops.kernels import ccw_angle_less

    rng = np.random.default_rng(8)
    n = 4096
    sx, sy, px, py, ex, ey = rng.standard_normal((6, n))
    a_sp = np.mod(np.arctan2(sx * py - sy * px, sx * px + sy * py), 2 * np.pi)
    a_se = np.mod(np.arctan2(sx * ey - sy * ex, sx * ex + sy * ey), 2 * np.pi)
    ref = a_sp < a_se
    got = np.asarray(ccw_angle_less(*map(jnp.asarray, (sx, sy, px, py, ex, ey))))
    np.testing.assert_array_equal(got, ref)


def test_pallas_safe_point_arc_matches_original():
    """k_point_arc_coincident_pallas == k_point_arc_coincident on random
    states (values AND branch selection)."""
    from ezpz_tpu.ops.kernels import (
        KERNELS,
        k_point_arc_coincident_pallas,
    )

    spec = KERNELS["point_arc_coincident"]
    rng = np.random.default_rng(9)
    v = jnp.asarray(rng.uniform(-10, 10, (256, 8)))
    ref, dref = jax.vmap(lambda vv: spec.fn(vv, jnp.zeros((0,))))(v)
    got, dgot = jax.vmap(lambda vv: k_point_arc_coincident_pallas(vv, jnp.zeros((0,))))(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(dgot), np.asarray(dref))


def test_all_kernels_have_ds_variants():
    """Every constraint kernel now has a double-single variant — no
    topology is excluded from the fused path by kernel coverage."""
    from ezpz_tpu.ops.ds import DS_KERNELS
    from ezpz_tpu.ops.kernels import KERNELS

    assert set(DS_KERNELS) == set(KERNELS)


def test_fused_arc_length_topology():
    """The last DS holdout (arc_length, needs ds_sincos) solves fused and
    matches the plain mixed path."""
    from ezpz_tpu.datatypes import DatumCircularArc

    arc = DatumCircularArc(center=DatumPoint(4, 5), start=DatumPoint(0, 1),
                           end=DatumPoint(2, 3))
    cs = [
        Constraint.Fixed(4, 0.0), Constraint.Fixed(5, 0.0),  # center
        Constraint.Fixed(0, 1.0), Constraint.Fixed(1, 0.0),  # start
        Constraint.Arc(arc),
        Constraint.ArcLength(arc, 1.0),
    ]
    system = compile_system(cs, n_vars=6)
    B = 1024
    x0 = jnp.asarray(np.tile(
        np.array([1.0, 0.0, 0.6, 0.9, 0.0, 0.0]), (B, 1)))
    pars = _pars_for(system, B)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    out = solver.solve(x0, pars)
    assert solver._fused_runs[B] is not None  # fused, no fallback
    assert bool(np.asarray(out.converged).all())
    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-6)


def test_fused_pads_when_batch_does_not_tile():
    """B not a multiple of the kernel tile: the batch is padded up to the
    tile unit (repeating the last sketch) and STILL takes the fused Pallas
    path — no silent XLA fallback for odd batch sizes (VERDICT r2). Results
    are sliced back to B and match the XLA mixed path."""
    system = _mixed_system()
    B = 100  # not a multiple of 1024
    rng = np.random.default_rng(11)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.02, (B, 7)))
    pars = _pars_for(system, B)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    out = solver.solve(x0, pars)
    assert 100 not in solver._fused_runs  # padded: keyed by padded size
    assert solver._fused_runs[1024] is not None  # fused path, no fallback
    assert int(np.asarray(out.x).shape[0]) == B
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())
    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-7)


def test_fused_large_coordinate_fleet_scale_aware_tolerance():
    """Coordinate scale 1e4 through the fused kernel: the in-kernel
    per-lane scaling of the coarse tolerance (5e-6 * max(1, |x0|_inf))
    keeps the f32 phase from burning its budget on an unreachable
    absolute target, and the DS refinement still verifies the ABSOLUTE
    1e-8 f64 residual (DS precision ~2e-10 at this scale). Convergence
    behavior matches the O(1) case (VERDICT r2 item 7)."""
    p0, p1 = DatumPoint(0, 1), DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(p0.x_id, 10000.0),
        Constraint.Fixed(p0.y_id, -20000.0),
        Constraint.Distance(p0, p1, 4.0),
    ]
    system = compile_system(cs, n_vars=4)
    B = 1024
    rng = np.random.default_rng(12)
    base = np.array([10000.0, -20000.0, 10002.8, -19997.2])
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.05, (B, 4)))
    pars = _pars_for(system, B)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    raw = solver.solve(x0, pars)
    assert solver._fused_runs[B] is not None  # fused path, no fallback
    conv = np.asarray(raw.converged)
    # Without scaling the coarse phase freezes at an unreachable absolute
    # target and <50% of lanes converge; with the f32-floor scaling the
    # cheap coarse trips stay productive. A small tail can exceed the
    # 4-trip refine budget (f32 Jacobian cancellation at this scale gives
    # a linear tail) — honestly flagged, finished below.
    assert conv.mean() >= 0.8
    r, _deg = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
        jnp.asarray(raw.x, jnp.float64), *pars)
    assert float(jnp.max(jnp.abs(np.asarray(r)[conv]))) <= 1e-8

    out = solver.solve(x0, pars, finish_stragglers=True)
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())
    r, _deg = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
        jnp.asarray(out.x, jnp.float64), *pars)
    assert float(jnp.max(jnp.abs(r))) <= 1e-8


def test_fused_finish_stragglers():
    """Far-from-solution lanes can need more LM iterations than the fixed
    kernel trip budget; the kernel honestly reports them unconverged, and
    ``finish_stragglers=True`` re-solves exactly those lanes through the
    full-budget XLA path and merges — matching plain mixed per lane."""
    system = _mixed_system()  # genuinely nonlinear (arc span, tangency)
    B = 1024
    rng = np.random.default_rng(0)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = np.tile(base, (B, 1)) + rng.normal(0, 0.4, (B, 7))  # far guesses
    pars = _pars_for(system, B)
    # A deliberately tiny trip budget guarantees stragglers regardless of
    # how effective the kernel's LM trips are.
    solver = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True,
                        pallas_trips=1, refine_trips=1)
    raw = solver.solve(jnp.asarray(x0), pars)
    conv_raw = np.asarray(raw.converged)
    assert not conv_raw.all(), "scenario should produce stragglers"

    out = solver.solve(jnp.asarray(x0), pars, finish_stragglers=True)
    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(jnp.asarray(x0), pars)
    # Straggler lanes re-solve through the SAME full-budget XLA callable,
    # restarting from their original guesses: exactly equal to plain mixed
    # (including any lanes the full budget still cannot converge).
    idx = np.flatnonzero(~conv_raw)
    np.testing.assert_array_equal(np.asarray(out.x)[idx], np.asarray(ref.x)[idx])
    np.testing.assert_array_equal(np.asarray(out.iterations)[idx],
                                  np.asarray(ref.iterations)[idx])
    np.testing.assert_array_equal(np.asarray(out.converged)[idx],
                                  np.asarray(ref.converged)[idx])
    # converged kernel lanes are untouched
    keep = np.flatnonzero(conv_raw)
    np.testing.assert_array_equal(np.asarray(out.x)[keep],
                                  np.asarray(raw.x)[keep])


def test_fused_degenerate_flags():
    p0, p1 = DatumPoint(0, 1), DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(p0.x_id, 0.0),
        Constraint.Fixed(p0.y_id, 0.0),
        Constraint.Distance(p0, p1, 2.0),
    ]
    system = compile_system(cs, n_vars=4)
    B = 1024
    x0 = jnp.asarray(np.zeros((B, 4)))  # p1 exactly on p0: degenerate
    pars = _pars_for(system, B)
    out = BatchSolver(system, Config(), batch_params=True, precision="mixed",
                      pallas_fused=True).solve(x0, pars)
    deg = np.asarray(out.degenerate)
    assert deg[:, 2].all()
    assert not deg[:, 0].any() and not deg[:, 1].any()


def test_fused_flag_bits_past_word_boundary():
    """Round-5 flags travel bit-packed 32-per-i32-word through the
    kernels; every pre-existing flag test used tiny topologies (every
    cid in word 0), where a word-indexing or bit-31 sign-wrap bug is
    invisible — and 'all satisfied' mid-size runs can't see a bit
    PERMUTATION either. This pins specific bits in word 0's sign bit
    (cid 31) and in word 1 (cids 35, 37) of a 42-constraint topology:

    * cid 31 and 37: Distance between coincident duplicate points with
      d=0 — satisfied but Jacobian-DEGENERATE;
    * cid 35: a Fixed conflicting with an earlier Fixed on the same
      variable — least-squares compromise leaves BOTH unsatisfied;
    * every flag matrix must equal the XLA mixed path's elementwise
      (the XLA path computes flags without any packing)."""
    n_pts = 20
    pts = [DatumPoint(2 * i, 2 * i + 1) for i in range(n_pts)]
    cs = [Constraint.Fixed(pts[0].x_id, 0.0),
          Constraint.Fixed(pts[0].y_id, 0.0)]
    x0v = np.zeros(2 * n_pts)
    # cids 2..20: a consistent chain of 19 distances
    for i in range(1, n_pts):
        cs.append(Constraint.Distance(pts[i - 1], pts[i], 1.0))
        x0v[pts[i].x_id] = i + 0.01 * ((-1) ** i)
    # cids 21..30: harmless y-pins
    for i in range(1, 11):
        cs.append(Constraint.Fixed(pts[i].y_id, 0.0))
    assert len(cs) == 31
    cs.append(Constraint.Distance(pts[5], pts[5], 0.0))   # cid 31 (sign bit)
    cs.append(Constraint.Fixed(pts[11].y_id, 0.0))        # cid 32
    cs.append(Constraint.Fixed(pts[12].y_id, 0.0))        # cid 33
    cs.append(Constraint.Fixed(pts[13].y_id, 0.0))        # cid 34
    cs.append(Constraint.Fixed(pts[1].x_id, 2.0))         # cid 35: conflicts
    cs.append(Constraint.Fixed(pts[14].y_id, 0.0))        # cid 36
    cs.append(Constraint.Distance(pts[7], pts[7], 0.0))   # cid 37 (word 1)
    cs.append(Constraint.Fixed(pts[15].y_id, 0.0))        # cid 38
    cs.append(Constraint.Fixed(pts[16].y_id, 0.0))        # cid 39
    cs.append(Constraint.Fixed(pts[17].y_id, 0.0))        # cid 40
    cs.append(Constraint.Fixed(pts[18].y_id, 0.0))        # cid 41
    system = compile_system(cs, n_vars=2 * n_pts)
    assert system.n_constraints == 42

    B = 1024
    x0 = jnp.asarray(np.tile(x0v, (B, 1)))
    pars = _pars_for(system, B)
    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fused.solve(x0, pars)
    assert fused._fused_runs and list(fused._fused_runs.values())[0] is not None
    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)

    deg = np.asarray(out.degenerate)
    sat = np.asarray(out.satisfied)
    assert deg[:, 31].all() and deg[:, 37].all()
    assert not np.delete(deg, [31, 37], axis=1).any()
    assert not sat[:, 35].any()  # the conflicting Fixed loses
    assert sat[:, 31].all() and sat[:, 37].all()  # d=0 at coincident pts

    # Cross-path flag equality where both paths converged (the fixed-trip
    # kernel may honestly report the inconsistent lanes unconverged where
    # the full-budget XLA loop reaches its step tolerance; the packed-bit
    # assertions above already came from the KERNEL output either way).
    both = np.asarray(out.converged) & np.asarray(ref.converged)
    if both.any():
        np.testing.assert_array_equal(deg[both],
                                      np.asarray(ref.degenerate)[both])
        np.testing.assert_array_equal(sat[both],
                                      np.asarray(ref.satisfied)[both])


def test_ccw_angle_less_boundary_angle_contract():
    """ccw_angle_less's documented tie-breaks at exact boundary angles
    (measure-zero for random inputs, so the random agreement test above
    cannot see them; mutation-found):

    * angle(s->p) exactly 0 (p parallel to s, same direction) counts as
      inside the first half-turn -- the half-plane membership must come
      from the true dot product sign at cross == 0;
    * p parallel to e (equal angles) is NOT "less" -- the in-half
      comparison is strict."""
    from ezpz_tpu.ops.kernels import ccw_angle_less

    def f(*args):
        return bool(ccw_angle_less(*[jnp.asarray(float(a)) for a in args]))

    # angle 0: s=(1,1), p=2s (cross==0, dot>0), e at +90deg -> 0 < pi/2.
    assert f(1, 1, 2, 2, -1, 1) is True
    # angle pi: p=-3s (cross==0, dot<0) -> pi < pi/4 is False.
    assert f(1, 1, -3, -3, 0, 1) is False
    # equal angles: p = 2e exactly -> "less" must be False (strict).
    assert f(1, 0, 0, 2, 0, 1) is False


def test_fused_pads_up_not_down_past_one_unit():
    """B = 1500 (above one tile unit, not a multiple): the pad must round
    UP to 2048 — a corrupted rounding that lands at one unit (1024 < B)
    would drop sketches (mutation-found in the padding arithmetic)."""
    system = _mixed_system()
    B = 1500
    rng = np.random.default_rng(13)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.02, (B, 7)))
    pars = _pars_for(system, B)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    out = solver.solve(x0, pars)
    assert 2048 in solver._fused_runs
    assert int(np.asarray(out.x).shape[0]) == B
    assert bool(np.asarray(out.converged).all())


def _rect_chain(R: int):
    """R rectangles chained corner-to-corner (benches/midsize_bench.py's
    construction): 6R+2 dim-1 constraints, 2(3R+1) vars. R >= 4 exceeds the
    24-instance dense-unroll ceiling and exercises the Pallas kernels'
    sparsity-aware (symbolic-fill) Cholesky path."""
    pts = [DatumPoint(2 * i, 2 * i + 1) for i in range(3 * R + 1)]
    cons = [
        Constraint.Fixed(pts[0].x_id, 1.0),
        Constraint.Fixed(pts[0].y_id, 1.0),
    ]
    guess = [(1.0, 1.0)]
    for k in range(R):
        s, u, v, w = pts[3 * k:3 * k + 4]
        cons += [
            Constraint.Horizontal(DatumLineSegment(s, u)),
            Constraint.Vertical(DatumLineSegment(u, v)),
            Constraint.Horizontal(DatumLineSegment(v, w)),
            Constraint.Vertical(DatumLineSegment(w, s)),
            Constraint.Distance(s, u, 4.0),
            Constraint.Distance(s, w, 3.0),
        ]
        sx, sy = guess[3 * k]
        guess += [(sx + 3.5, sy + 0.5), (sx + 4.2, sy + 3.4),
                  (sx + 0.5, sy + 2.6)]
    x0 = np.array([c for p in guess for c in p])
    return cons, x0


def test_fused_midsize_chain_matches_mixed_path():
    """A 26-instance / 26-var chained-rectangle topology — past the dense
    24-instance unroll ceiling — must take the fused Pallas path via the
    sparsity-aware Cholesky and agree with the XLA mixed path."""
    cons, base = _rect_chain(4)
    system = compile_system(cons, n_vars=len(base))
    assert sum(int(b.idx.shape[0]) for b in system.blocks) == 26

    B = 1024
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.01, (B, len(base))))
    pars = _pars_for(system, B)

    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fused.solve(x0, pars)
    assert fused._fused_runs and list(fused._fused_runs.values())[0] is not None
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())

    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-6)
    # True f64 residual at the fused answer meets the 1e-8 tolerance.
    r, _ = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
        jnp.asarray(out.x, jnp.float64), *pars)
    assert float(jnp.max(jnp.abs(r))) <= 1e-8


def _shuffled_rect_chain(R: int, seed: int = 5):
    """_rect_chain with the VARIABLE NUMBERING shuffled (same constraint
    graph): the banded structure survives only through an elimination
    reordering, so this exercises the RCM plan."""
    rng = np.random.default_rng(seed)
    n = 2 * (3 * R + 1)
    perm = rng.permutation(n)
    pts = [DatumPoint(int(perm[2 * i]), int(perm[2 * i + 1]))
           for i in range(3 * R + 1)]
    cons = [
        Constraint.Fixed(pts[0].x_id, 1.0),
        Constraint.Fixed(pts[0].y_id, 1.0),
    ]
    guess = [(1.0, 1.0)]
    for k in range(R):
        s, u, v, w = pts[3 * k:3 * k + 4]
        cons += [
            Constraint.Horizontal(DatumLineSegment(s, u)),
            Constraint.Vertical(DatumLineSegment(u, v)),
            Constraint.Horizontal(DatumLineSegment(v, w)),
            Constraint.Vertical(DatumLineSegment(w, s)),
            Constraint.Distance(s, u, 4.0),
            Constraint.Distance(s, w, 3.0),
        ]
        sx, sy = guess[3 * k]
        guess += [(sx + 3.5, sy + 0.5), (sx + 4.2, sy + 3.4),
                  (sx + 0.5, sy + 2.6)]
    x0 = np.zeros(n)
    for i, (gx, gy) in enumerate(guess):
        x0[perm[2 * i]] = gx
        x0[perm[2 * i + 1]] = gy
    return cons, x0


def test_rcm_plan_tames_shuffled_numbering():
    """A shuffled chain has a banded GRAPH but a fill-heavy numbering: the
    factorization plan must pick the RCM ordering and land near the
    well-ordered chain's fill; a well-ordered chain must keep the identity
    ordering (bit-exact dense equivalence preserved)."""
    from ezpz_tpu.ops.pallas_fleet import (_instance_list, _jtj_pattern,
                                           _plan_factorization,
                                           _symbolic_fill, jtj_fill_count)

    cons, x0 = _rect_chain(6)          # 38 inst / 38 vars, well-ordered
    sys_ord = compile_system(cons, n_vars=len(x0), dtype=jnp.float32)
    cons_s, x0_s = _shuffled_rect_chain(6)
    sys_shuf = compile_system(cons_s, n_vars=len(x0_s), dtype=jnp.float32)

    inst_ord = _instance_list(sys_ord)
    inst_shuf = _instance_list(sys_shuf)
    n = sys_ord.n_vars

    # RCM accepts only strict improvements, so the planned fill is never
    # worse than identity (on THIS chain it even beats the natural
    # declaration order, 153 -> 111).
    id_fill_ord = sum(map(sum, _symbolic_fill(_jtj_pattern(inst_ord, n), n)))
    assert jtj_fill_count(sys_ord) <= id_fill_ord

    # identity fill on the shuffled numbering is much worse than the plan's
    id_fill = sum(map(sum, _symbolic_fill(_jtj_pattern(inst_shuf, n), n)))
    perm_shuf, nzL = _plan_factorization(inst_shuf, n)
    assert perm_shuf is not None
    plan_fill = sum(map(sum, nzL))
    assert plan_fill < id_fill / 2
    # the shuffle is fully repaired: same graph -> same RCM fill
    assert plan_fill == jtj_fill_count(sys_ord)


def test_plan_tie_keeps_identity_ordering():
    """On a fill TIE the plan must keep the identity ordering — RCM is
    accepted only on STRICT improvement, preserving bit-exact equivalence
    with the dense unroll for already-well-ordered topologies (a diagonal
    pattern ties: every ordering of decoupled variables fills n).
    Mutation-found: `<` -> `<=` in the acceptance rule flips ties to a
    gratuitous RCM relabeling."""
    from ezpz_tpu.ops.pallas_fleet import _plan_factorization

    insts = [(None, [i]) for i in range(9)]
    perm, nzL = _plan_factorization(insts, 9)
    assert perm is None
    assert sum(map(sum, nzL)) == 9


def test_symbolic_plan_matches_numeric_cholesky():
    """Brute-force oracle for the factorization plan on random topologies:
    build a generic SPD matrix with EXACTLY the instance pattern, factor
    it numerically, and check (a) every numerically-nonzero factor entry
    is inside the symbolic fill (no under-approximation — a miss would
    silently drop terms from the in-kernel factorization), (b) the
    returned RCM ordering is a true permutation, and (c) the planned fill
    never exceeds the identity ordering's (the plan's acceptance rule)."""
    from ezpz_tpu.ops.pallas_fleet import (_jtj_pattern, _plan_factorization,
                                           _symbolic_fill)

    rng = np.random.default_rng(42)
    for trial in range(12):
        n = int(rng.integers(4, 24))
        n_inst = int(rng.integers(2, 3 * n))
        insts = []
        for _ in range(n_inst):
            k = int(rng.integers(1, min(6, n) + 1))
            ids = sorted(set(int(v) for v in rng.integers(0, n, k)))
            insts.append((None, ids))

        pat = _jtj_pattern(insts, n)
        perm, nzL = _plan_factorization(insts, n)

        # (b) perm is a permutation (or None = identity kept)
        if perm is not None:
            assert sorted(perm) == list(range(n)), (trial, perm)
        # (c) acceptance rule: plan fill <= identity fill
        id_fill = sum(map(sum, _symbolic_fill(pat, n)))
        assert sum(map(sum, nzL)) <= id_fill, trial

        # (a) numeric oracle in the PLANNED ordering: assemble a generic
        # SPD matrix with exactly the pattern, permute, factor, compare.
        A = np.zeros((n, n))
        for _, ids in insts:
            g = rng.normal(1.0, 0.3, len(ids))
            A[np.ix_(ids, ids)] += np.outer(g, g)
        A += np.eye(n) * (1.0 + np.abs(A).sum(axis=1).max())
        order = perm if perm is not None else list(range(n))
        Ap = A[np.ix_(order, order)]
        L = np.linalg.cholesky(Ap)
        numeric = np.abs(L) > 1e-12
        for i in range(n):
            for j in range(i + 1):
                if numeric[i, j]:
                    assert nzL[i][j], (trial, i, j)


def test_fused_shuffled_chain_matches_mixed_path():
    """The fused kernel under an RCM elimination plan (shuffled 14-var
    chain) must agree with the XLA mixed path."""
    cons, base = _shuffled_rect_chain(2)
    system = compile_system(cons, n_vars=len(base))

    from ezpz_tpu.ops.pallas_fleet import _instance_list, _plan_factorization
    perm, _ = _plan_factorization(
        _instance_list(system.astype(jnp.float32)), system.n_vars)
    assert perm is not None  # the shuffle must actually trigger RCM

    B = 1024
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.01, (B, len(base))))
    pars = _pars_for(system, B)

    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fused.solve(x0, pars)
    assert fused._fused_runs and list(fused._fused_runs.values())[0] is not None
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())

    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-6)


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("EZPZ_TPU_RUN_SLOW_FUSED", "0") != "1",
    reason="~10-30 min in interpret mode (68-var kernel x 1024 lanes); "
           "run via `just fused-past64` / EZPZ_TPU_RUN_SLOW_FUSED=1. "
           "The real-chip equivalence evidence is MIDSIZE_r04.json's "
           "correctness gate (converged + satisfied + true-f64 residual).")
def test_fused_past64_chain_matches_mixed_path():
    """A 68-instance / 68-var chain — past the unconditional 64-instance
    ceiling, admitted by the FILL-aware gate (planned fill well under
    dense-64's 2080 budget) — must take the fused Pallas path end-to-end
    and agree with the XLA mixed path. Interpret mode makes this the
    suite's slowest fused run; real-chip numbers live in MIDSIZE_r04.json."""
    cons, base = _rect_chain(11)
    system = compile_system(cons, n_vars=len(base))
    assert sum(int(b.idx.shape[0]) for b in system.blocks) == 68

    B = 1024
    rng = np.random.default_rng(13)
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.01, (B, len(base))))
    pars = _pars_for(system, B)

    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    assert fused._pallas_topology_ok()
    out = fused.solve(x0, pars)
    assert fused._fused_runs and list(fused._fused_runs.values())[0] is not None
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())

    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=1e-6)
    # True f64 residual at the fused answer meets the 1e-8 tolerance.
    r, _ = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
        jnp.asarray(out.x, jnp.float64), *pars)
    assert float(jnp.max(jnp.abs(r))) <= 1e-8
