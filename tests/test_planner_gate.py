"""Eligibility-gate ordering + symbolic-planner cost bounds + backend-
rejection fallbacks.

Round-4 hazard (VERDICT weak #1): the Pallas path builders called
``_pick_tile`` — which forces the symbolic fill planner — BEFORE the
cheap instance-count gate, and the planner was an O(n^3) Python triple
loop; ``serve`` auto-enables the fused path per topology group, so one
large coupled sketch hung the first request for minutes. These tests pin
(a) the gate short-circuits before any fill computation, (b) a
1,000-var decline is sub-second (etree early-exit planner), (c) the
etree fill equals the Crout-recurrence reference, and (d) both
``BatchSolver`` and ``FleetSolver`` degrade to XLA on a backend
rejection but PROPAGATE real defects (``ezpz/src/solver.rs:270,289-300``
is the reference's symbolic-LLT analog; it has no serving surface to
protect).
"""

import time

import numpy as np
import jax.numpy as jnp
import pytest

import ezpz_tpu  # noqa: F401
from ezpz_tpu.batch import (PALLAS_MAX_FILL, PALLAS_MAX_INSTANCES,
                            BatchSolver, _is_backend_rejection)
from ezpz_tpu.config import Config
from ezpz_tpu.constraints import Constraint
from ezpz_tpu.datatypes import DatumPoint
from ezpz_tpu.models.compiled import compile_system

from .test_ds_fused import _pars_for


def _crout_fill_reference(pat, n):
    """The round-4 O(n^3) Crout fill recurrence, kept as the oracle."""
    nzL = [[False] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            nzL[i][j] = (
                (i, j) in pat
                or any(nzL[i][k] and nzL[j][k] for k in range(j))
            )
    return nzL


def test_etree_fill_matches_crout_reference():
    """The O(nnz(L)) etree analysis computes the same structural fill as
    the Crout recurrence on random patterns (Parter/Rose closure)."""
    from ezpz_tpu.ops.pallas_fleet import _symbolic_fill

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 28))
        pat = {(i, i) for i in range(n)}
        for _ in range(int(rng.integers(0, 3 * n))):
            i, j = rng.integers(0, n, 2)
            if i != j:
                pat.add((max(int(i), int(j)), min(int(i), int(j))))
        assert _symbolic_fill(pat, n) == _crout_fill_reference(pat, n), trial


def test_etree_fill_early_exit_exact_under_limit():
    """With a limit, the count is exact whenever the true count is at or
    below it, and reports limit+1 (without finishing) otherwise."""
    from ezpz_tpu.ops.pallas_fleet import _etree_fill

    rng = np.random.default_rng(8)
    for trial in range(20):
        n = int(rng.integers(2, 24))
        pat = {(i, i) for i in range(n)}
        for _ in range(int(rng.integers(0, 3 * n))):
            i, j = rng.integers(0, n, 2)
            if i != j:
                pat.add((max(int(i), int(j)), min(int(i), int(j))))
        true_count, _rows = _etree_fill(pat, n)
        assert _etree_fill(pat, n, limit=true_count)[0] == true_count
        assert _etree_fill(pat, n, limit=true_count - 1) == (true_count, None)


def test_oversized_instance_count_declines_without_fill(monkeypatch):
    """A topology past PALLAS_MAX_INSTANCES must decline from the cheap
    instance gate alone — the symbolic planner must never run (serve
    routes whole topology groups here; planning first was the round-4
    first-request hang)."""
    import ezpz_tpu.ops.pallas_fleet as pf

    n = PALLAS_MAX_INSTANCES + 20
    cons = [Constraint.Fixed(i, float(i)) for i in range(n)]
    system = compile_system(cons, n_vars=n)

    def _boom(*a, **k):
        raise AssertionError("symbolic planner ran before the instance gate")

    monkeypatch.setattr(pf, "jtj_fill_count", _boom)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    assert solver._pallas_fused_fn(1024) is None
    assert solver._pallas_coarse_fn(1024) is None
    assert not hasattr(solver, "_fill_count_cache")


def test_thousand_var_decline_is_subsecond():
    """A 1,000-var expander-coupled topology (fill far past the cap under
    ANY ordering) must decline in well under a second: the etree planner
    early-exits at the gate cap instead of completing an O(n^3) analysis."""
    from ezpz_tpu.ops.pallas_fleet import jtj_fill_count

    rng = np.random.default_rng(3)
    n_vars = 1000
    cons = []
    # 250 Distance instances over random point pairs: ~3 edges/var of
    # random coupling — an expander-like graph whose fill is Theta(n^2)
    # under any elimination ordering.
    for _ in range(250):
        a, b = rng.choice(n_vars // 2, size=2, replace=False)
        p0 = DatumPoint(int(2 * a), int(2 * a + 1))
        p1 = DatumPoint(int(2 * b), int(2 * b + 1))
        cons.append(Constraint.Distance(p0, p1, 1.0))
    system = compile_system(cons, n_vars=n_vars)

    t0 = time.perf_counter()
    capped = jtj_fill_count(system, limit=PALLAS_MAX_FILL)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    declined = solver._pallas_fused_fn(1024)
    dt = time.perf_counter() - t0

    assert capped == PALLAS_MAX_FILL + 1  # the early exit actually fired
    assert declined is None
    assert dt < 1.0, f"decline took {dt:.2f}s"


def _tiny_fused_pair():
    p, q = DatumPoint(0, 1), DatumPoint(2, 3)
    cons = [Constraint.Fixed(0, 0.0), Constraint.Fixed(1, 0.0),
            Constraint.Distance(p, q, 5.0)]
    system = compile_system(cons, n_vars=4)
    B = 1024
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(
        np.tile([0.0, 0.0, 3.0, 4.0], (B, 1)) + rng.normal(0, 1e-2, (B, 4)))
    return system, x0, _pars_for(system, B)


def test_batch_real_defect_propagates():
    """A non-backend error from the fused kernel (a packing/tracing bug,
    bad user input) must RAISE, not be cached as a permanent rejection
    and silently degraded (round-4 advisor finding)."""
    system, x0, pars = _tiny_fused_pair()
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)

    def _bug(x, p):
        raise ValueError("a real defect")

    solver._fused_runs[1024] = _bug
    with pytest.raises(ValueError, match="a real defect"):
        solver.solve(x0, pars)
    assert solver._fused_runs[1024] is _bug  # not cached away


def test_batch_backend_rejection_degrades():
    """A Mosaic-style resource rejection degrades to the XLA path with a
    warning and caches the rejection for that batch size."""
    system, x0, pars = _tiny_fused_pair()
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)

    def _reject(x, p):
        raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of scoped vmem")

    solver._fused_runs[1024] = _reject
    solver._pallas_runs[1024] = _reject
    with pytest.warns(RuntimeWarning, match="falling back to the XLA"):
        out = solver.solve(x0, pars)
    assert solver._fused_runs[1024] is None
    assert bool(np.asarray(out.converged).all())
    assert np.allclose(
        np.hypot(np.asarray(out.x)[:, 2], np.asarray(out.x)[:, 3]), 5.0)


def test_fleet_backend_rejection_degrades():
    """FleetSolver's shard-mapped fused path gets the same safety net as
    BatchSolver (round-4 VERDICT weak #2): a backend rejection degrades
    to the sharded XLA path instead of crashing the multi-device solve."""
    import jax

    from ezpz_tpu.parallel import FleetSolver

    system, _x0, _pars = _tiny_fused_pair()
    fleet = FleetSolver(system, batch_params=True, precision="mixed",
                        pallas_fused=True)
    D = int(fleet.mesh.devices.size)
    B = 1024 * D
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(
        np.tile([0.0, 0.0, 3.0, 4.0], (B, 1)) + rng.normal(0, 1e-2, (B, 4)))
    pars = _pars_for(system, B)

    def _reject(x, p):
        raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of scoped vmem")

    fleet._fused_fleet_runs[B] = _reject
    with pytest.warns(RuntimeWarning, match="sharded XLA path"):
        out = fleet.solve(x0, pars)
    assert fleet._fused_fleet_runs[B] is None
    assert bool(np.asarray(out.converged).all())
    assert np.allclose(
        np.hypot(np.asarray(out.x)[:, 2], np.asarray(out.x)[:, 3]), 5.0)

    # ... and a real defect propagates there too.
    def _bug(x, p):
        raise ValueError("a real defect")

    fleet._fused_fleet_runs[B] = _bug
    with pytest.raises(ValueError, match="a real defect"):
        fleet.solve(x0, pars)


def test_nested_dissection_wins_on_grids_loses_on_chains():
    """The planner's candidate set (identity, RCM, ND): ND must produce a
    true permutation and strictly beat RCM on a 2-D grid's fill (the
    topology class it was added for, VERDICT r4 item #1b), while chains
    keep RCM (strict-improvement acceptance)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__))), "benches"))
    from midsize_bench import rect_chain, rect_grid

    from ezpz_tpu.ops.pallas_fleet import (_etree_fill, _instance_list,
                                           _jtj_pattern, _nd_order,
                                           _permuted_pattern, _rcm_order,
                                           jtj_fill_count)

    gcons, gx0 = rect_grid(5, 5)
    gsys = compile_system(gcons, n_vars=len(gx0), dtype=jnp.float32)
    insts = _instance_list(gsys)
    n = gsys.n_vars
    pat = _jtj_pattern(insts, n)
    nd = _nd_order(pat, n)
    assert sorted(nd) == list(range(n))  # a true permutation
    fill_nd = _etree_fill(_permuted_pattern(pat, nd, n), n)[0]
    fill_rcm = _etree_fill(
        _permuted_pattern(pat, _rcm_order(pat, n), n), n)[0]
    assert fill_nd < fill_rcm, (fill_nd, fill_rcm)
    assert jtj_fill_count(gsys) == fill_nd  # the plan actually uses ND

    ccons, cx0 = rect_chain(8)
    csys = compile_system(ccons, n_vars=len(cx0))
    cinsts = _instance_list(csys.astype(jnp.float32))
    cn = csys.n_vars
    cpat = _jtj_pattern(cinsts, cn)
    cfill_nd = _etree_fill(
        _permuted_pattern(cpat, _nd_order(cpat, cn), cn), cn)[0]
    cfill_rcm = _etree_fill(
        _permuted_pattern(cpat, _rcm_order(cpat, cn), cn), cn)[0]
    assert cfill_rcm <= cfill_nd  # chains: RCM keeps winning
    assert jtj_fill_count(csys) == min(cfill_rcm, cfill_nd,
                                       _etree_fill(cpat, cn)[0])


def test_backend_rejection_classifier():
    assert _is_backend_rejection(
        RuntimeError("RESOURCE_EXHAUSTED: scoped vmem limit"))
    assert _is_backend_rejection(RuntimeError("Mosaic lowering failed"))
    assert _is_backend_rejection(RuntimeError(
        "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1"))
    assert not _is_backend_rejection(ValueError("bad shape"))
    assert not _is_backend_rejection(TypeError("not an array"))

    # Classification is by message markers, NOT exception type: a bare
    # runtime fault (e.g. a transient XlaRuntimeError at EXECUTION time)
    # must propagate, not be cached as a permanent compile rejection and
    # silently degrade every later solve at that batch size.
    class XlaRuntimeError(RuntimeError):
        pass

    assert not _is_backend_rejection(
        XlaRuntimeError("INTERNAL: transient execution failure"))
    assert _is_backend_rejection(
        XlaRuntimeError("RESOURCE_EXHAUSTED: Ran out of scoped vmem"))
