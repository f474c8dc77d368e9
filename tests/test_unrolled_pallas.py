"""Unrolled evaluator + Pallas fleet kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import ezpz_tpu  # noqa: F401
from ezpz_tpu.config import Config
from ezpz_tpu.constraints import Constraint
from ezpz_tpu.datatypes import DatumCircle, DatumDistance, DatumLineSegment, DatumPoint
from ezpz_tpu.models.compiled import compile_system
from ezpz_tpu.ops.pallas_fleet import (
    make_coarse_fleet_solver,
    pack_fleet,
    unpack_rows,
)
from ezpz_tpu.ops.unrolled import UnrolledSystem
from ezpz_tpu.solver import solve_lm


def _mixed_system(dtype=jnp.float64):
    # Well-constrained on purpose: an underconstrained direction would make
    # bit-level arithmetic differences (gather vs unrolled evaluation in
    # f32) land on different points of the solution manifold.
    p0, p1 = DatumPoint(0, 1), DatumPoint(2, 3)
    circle = DatumCircle(center=DatumPoint(4, 5), radius=DatumDistance(6))
    cs = [
        Constraint.Fixed(p0.x_id, 0.25),
        Constraint.Fixed(p0.y_id, 0.1),
        Constraint.Distance(p0, p1, 3.0),
        Constraint.Vertical(DatumLineSegment(p0, p1)),
        Constraint.CircleRadius(circle, 1.5),
        Constraint.PointsCoincident(p1, circle.center),
    ]
    weights = [1.0, 1.0, 2.0, 1.0, 1.0, 0.5]
    return compile_system(cs, n_vars=7, weights=weights, dtype=dtype)


def test_unrolled_matches_compiled():
    system = _mixed_system()
    un = UnrolledSystem(system)
    x = jnp.asarray(np.linspace(0.1, 1.9, 7))

    r_c, deg_c = system.residual_and_flags(x)
    r_u, deg_u = un.residual_and_flags(x)
    np.testing.assert_allclose(np.asarray(r_u), np.asarray(r_c), rtol=1e-14)
    np.testing.assert_array_equal(np.asarray(deg_u), np.asarray(deg_c))

    r_c, jtj_c, jtr_c, _ = system.normal_equations(x)
    r_u, jtj_u, jtr_u, _ = un.normal_equations(x)
    np.testing.assert_allclose(np.asarray(r_u), np.asarray(r_c), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(jtj_u), np.asarray(jtj_c), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(jtr_u), np.asarray(jtr_c), rtol=1e-12, atol=1e-14)

    J_c = system.jacobian_dense(x)
    J_u = un.jacobian_dense(x)
    np.testing.assert_allclose(np.asarray(J_u), np.asarray(J_c), rtol=1e-12, atol=1e-14)


def test_unrolled_solve_matches_compiled_solve():
    system = _mixed_system()
    un = UnrolledSystem(system)
    x0 = jnp.asarray(np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1]))
    cfg = Config()
    a = solve_lm(system, x0, cfg.max_iterations, cfg.residual_tolerance,
                 cfg.step_tolerance, cfg.initial_lambda)
    b = solve_lm(un, x0, cfg.max_iterations, cfg.residual_tolerance,
                 cfg.step_tolerance, cfg.initial_lambda)
    assert bool(a.converged) and bool(b.converged)
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x), atol=1e-12)


def test_batchsolver_pallas_coarse_matches_mixed():
    """BatchSolver(pallas_coarse=True): Pallas fori coarse + f64 refinement
    must converge, satisfy, and agree with the plain mixed path."""
    from ezpz_tpu.batch import BatchSolver

    system = _mixed_system()  # f64
    B = 1024
    rng = np.random.default_rng(3)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = jnp.asarray(np.tile(base, (B, 1)) + rng.normal(0, 0.02, (B, 7)))
    pars = tuple(
        jnp.asarray(np.tile(np.asarray(b.par), (B, 1, 1)))
        for b in system.blocks
    )

    pal = BatchSolver(system, Config(), batch_params=True, precision="mixed",
                      pallas_coarse=True).solve(x0, pars)
    assert bool(np.asarray(pal.converged).all())
    assert bool(np.asarray(pal.satisfied).all())

    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0, pars)
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x), atol=1e-6)
    assert int(np.asarray(pal.iterations).max()) <= Config().max_iterations


def test_pallas_coarse_reports_degenerate_flags():
    """Degenerate evaluations seen inside the Pallas coarse phase (or the
    refinement) must surface in the result's flags: coincident points under
    a Distance constraint mark its Jacobian degenerate."""
    from ezpz_tpu.batch import BatchSolver

    p0, p1 = DatumPoint(0, 1), DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(p0.x_id, 0.0),
        Constraint.Fixed(p0.y_id, 0.0),
        Constraint.Distance(p0, p1, 2.0),
    ]
    system = compile_system(cs, n_vars=4)
    B = 1024
    # Every lane starts with p1 exactly on p0: the distance kernel's first
    # evaluation is degenerate.
    x0 = jnp.asarray(np.zeros((B, 4)))
    pars = tuple(
        jnp.asarray(np.tile(np.asarray(b.par), (B, 1, 1)))
        for b in system.blocks
    )
    out = BatchSolver(system, Config(), batch_params=True, precision="mixed",
                      pallas_coarse=True).solve(x0, pars)
    deg = np.asarray(out.degenerate)  # (B, 3)
    assert deg[:, 2].all()  # the Distance constraint flagged on every lane
    assert not deg[:, 0].any() and not deg[:, 1].any()  # Fixed never flags


def test_blocksolver_mixed_pallas():
    """BlockSolver passes the precision/pallas options through to its
    per-bucket fleet solvers."""
    from ezpz_tpu.models.blocks import BlockSolver

    p, q = DatumPoint(0, 1), DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(p.x_id, 0.0),
        Constraint.Fixed(p.y_id, 0.0),
        Constraint.Distance(p, q, 4.0),
        Constraint.Vertical(DatumLineSegment(p, q)),
    ]
    x0 = np.array([0.1, -0.1, 0.2, 4.3])
    ref = BlockSolver(cs, 4).solve(x0)
    mix = BlockSolver(cs, 4, precision="mixed", pallas_coarse=True).solve(x0)
    assert mix.converged and mix.satisfied.all()
    np.testing.assert_allclose(mix.x, ref.x, atol=1e-6)


def test_batchsolver_pallas_coarse_untileable_falls_back():
    """A batch size that doesn't tile falls back to the XLA coarse phase."""
    from ezpz_tpu.batch import BatchSolver

    system = _mixed_system()
    B = 7  # not a multiple of 1024
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1])
    x0 = jnp.asarray(np.tile(base, (B, 1)))
    pars = tuple(
        jnp.asarray(np.tile(np.asarray(b.par), (B, 1, 1)))
        for b in system.blocks
    )
    out = BatchSolver(system, Config(), batch_params=True, precision="mixed",
                      pallas_coarse=True).solve(x0, pars)
    assert bool(np.asarray(out.converged).all())
    assert bool(np.asarray(out.satisfied).all())


def test_batched_lanes_freeze_on_convergence():
    """Regression: under vmap the while_loop runs until the SLOWEST lane
    finishes; already-converged lanes must freeze — identical x and
    iteration counts to solo solves — not keep stepping (which would drift
    underconstrained solutions)."""
    from ezpz_tpu.batch import BatchSolver

    # Underconstrained: nothing pins p0.y/p1.y absolutely.
    p0, p1 = DatumPoint(0, 1), DatumPoint(2, 3)
    cs = [
        Constraint.Fixed(p0.x_id, 0.25),
        Constraint.Distance(p0, p1, 3.0),
        Constraint.Vertical(DatumLineSegment(p0, p1)),
    ]
    system = compile_system(cs, n_vars=4)
    cfg = Config()

    # Lane 0 starts at the solution (0 iterations); lane 1 starts far away.
    x0s = np.array([
        [0.25, 1.0, 0.25, 4.0],
        [0.9, 0.4, -1.2, 2.7],
    ])
    batch = BatchSolver(system, cfg).solve(jnp.asarray(x0s))
    for lane in range(2):
        solo = solve_lm(system, jnp.asarray(x0s[lane]), cfg.max_iterations,
                        cfg.residual_tolerance, cfg.step_tolerance,
                        cfg.initial_lambda)
        assert int(np.asarray(batch.iterations)[lane]) == int(solo.iterations), lane
        np.testing.assert_allclose(np.asarray(batch.x)[lane],
                                   np.asarray(solo.x), atol=1e-12)
    assert int(np.asarray(batch.iterations)[0]) == 0


def test_pallas_coarse_fleet_interpret_matches_vmap():
    system32 = _mixed_system(dtype=jnp.float32)
    B, tile = 2048, 1024
    rng = np.random.default_rng(1)
    base = np.array([0.3, 0.1, 0.2, 3.3, 0.25, 3.2, 1.1], np.float32)
    x0 = np.tile(base, (B, 1)) + rng.normal(0, 0.02, (B, 7)).astype(np.float32)

    pars = tuple(
        jnp.asarray(np.tile(np.asarray(b.par, np.float32), (B, 1, 1)))
        for b in system32.blocks
    )

    run = make_coarse_fleet_solver(system32, 20, 5e-6, 1e-7, 1e-9,
                                   tile=tile, interpret=True)
    x_p, pars_p = pack_fleet(jnp.asarray(x0), system32, pars)
    x_out_p, its_p, convs_p, degs_p = run(x_p, pars_p)
    x_out = np.asarray(unpack_rows(x_out_p))  # (B, n)
    convs = np.asarray(unpack_rows(convs_p))  # (B, 1)
    its = np.asarray(unpack_rows(its_p))

    ref = jax.vmap(
        lambda xv, *pv: solve_lm(system32, xv, 20, jnp.float32(5e-6),
                                 jnp.float32(1e-7), jnp.float32(1e-9),
                                 pars=tuple(pv)).x
    )(jnp.asarray(x0), *pars)

    assert bool(convs.all())
    assert int(its.max()) <= 20
    np.testing.assert_allclose(x_out, np.asarray(ref), rtol=2e-5, atol=2e-5)


def _expander(npts: int):
    """A fill-heavy coupled topology: a chain plus pseudo-random chords
    (i -> 7i+3 mod npts). The chord graph is expander-like, so no
    elimination ordering (RCM included) can keep the factor sparse —
    the planned fill grows ~quadratically with npts."""
    from ezpz_tpu.datatypes import DatumPoint

    pts = [DatumPoint(2 * i, 2 * i + 1) for i in range(npts)]
    cons = [Constraint.Fixed(pts[0].x_id, 0.0),
            Constraint.Fixed(pts[0].y_id, 0.0)]
    for a, b in zip(pts, pts[1:]):
        cons.append(Constraint.Distance(a, b, 1.0))
    for i in range(npts):
        j = (i * 7 + 3) % npts
        if j != i:
            cons.append(Constraint.Distance(pts[i], pts[j], 2.0))
    return compile_system(cons, n_vars=2 * npts)


def test_pallas_eligibility_gates_are_disjunctive():
    """The Pallas fast paths must decline when ANY disqualifier holds —
    an untileable batch OR an oversized topology (mutation-found: an
    `and` would let one bad condition through on configs where the other
    is fine). Also pins the measured ceilings: 24 instances for the dense
    XLA unroll; for the Pallas kernels a planned-fill budget (the
    sparsity-aware Cholesky's trace size tracks fill, not variable count)
    and an instance cap bounding the residual/Jacobian row unroll."""
    from ezpz_tpu.batch import (PALLAS_MAX_FILL, PALLAS_MAX_INSTANCES,
                                UNROLL_MAX_INSTANCES, BatchSolver)

    assert UNROLL_MAX_INSTANCES == 24  # measured trace-size ceiling (XLA)
    assert PALLAS_MAX_FILL == 2080     # dense-64's factor nnz
    assert PALLAS_MAX_INSTANCES == 256  # row-unroll bound

    # 65 single-var instances (above round 3's 64-instance ceiling): the
    # factor is purely diagonal (fill 65) — the fill-based gate keeps it.
    big = compile_system([Constraint.Fixed(i, 1.0) for i in range(65)],
                         n_vars=65)
    s_big = BatchSolver(big, Config(), batch_params=True, precision="mixed",
                        pallas_coarse=True, pallas_fused=True)
    assert s_big._fill_count == 65
    assert s_big._pallas_coarse_fn(16384) is not None
    assert s_big._pallas_fused_fn(16384) is not None

    # Expander coupling: 161 instances whose planned fill exceeds the
    # budget no matter the ordering — declined even though the batch
    # tiles and the instance count is under the cap. (Round 5's nested-
    # dissection candidate squeezed the previous 60-point fixture to
    # fill 2044 <= 2080 — correctly ADMITTED now, so the probe grew.)
    exp = _expander(80)
    s_exp = BatchSolver(exp, Config(), batch_params=True, precision="mixed",
                        pallas_coarse=True, pallas_fused=True)
    n_inst = sum(int(b.idx.shape[0]) for b in exp.blocks)
    assert n_inst <= PALLAS_MAX_INSTANCES
    assert s_exp._fill_count > PALLAS_MAX_FILL
    assert not s_exp._pallas_topology_ok()
    assert s_exp._pallas_coarse_fn(16384) is None
    assert s_exp._pallas_fused_fn(16384) is None

    # EXACT boundaries (mutation-found: `<=` -> `<` on either gate was
    # invisible without same-value probes). Fill: stub the cached count —
    # the budget is inclusive at dense-64's 2080, exclusive above.
    okd = compile_system([Constraint.Fixed(i, 1.0) for i in range(8)],
                         n_vars=8)
    s_ok = BatchSolver(okd, Config(), batch_params=True, precision="mixed",
                       pallas_coarse=True, pallas_fused=True)
    s_ok._fill_count_cache = PALLAS_MAX_FILL
    assert s_ok._pallas_topology_ok()
    s_ok._fill_count_cache = PALLAS_MAX_FILL + 1
    assert not s_ok._pallas_topology_ok()

    # Instance cap: inclusive at 256 (diagonal fill stays under budget),
    # exclusive at 257.
    at_cap = compile_system(
        [Constraint.Fixed(i, 1.0) for i in range(PALLAS_MAX_INSTANCES)],
        n_vars=PALLAS_MAX_INSTANCES)
    s_cap = BatchSolver(at_cap, Config(), batch_params=True,
                        precision="mixed", pallas_coarse=True,
                        pallas_fused=True)
    assert s_cap._pallas_topology_ok()
    over = compile_system(
        [Constraint.Fixed(i, 1.0) for i in range(PALLAS_MAX_INSTANCES + 1)],
        n_vars=PALLAS_MAX_INSTANCES + 1)
    s_over = BatchSolver(over, Config(), batch_params=True,
                         precision="mixed", pallas_coarse=True,
                         pallas_fused=True)
    assert not s_over._pallas_topology_ok()

    # 1 instance: topology is fine, B=100 cannot tile (unit is 1024).
    small = compile_system([Constraint.Fixed(0, 1.0)], n_vars=1)
    s_small = BatchSolver(small, Config(), batch_params=True,
                          precision="mixed", pallas_coarse=True,
                          pallas_fused=True)
    assert s_small._pallas_coarse_fn(100) is None
    assert s_small._pallas_fused_fn(100) is None

    # The VMEM-model slack term (+64 blocks) sits at a tile boundary for
    # 96 diagonal instances at B=16384: blocks = 14*96 + 8*3 + 64 = 1432
    # -> lanes 2007 -> tile 1024. Dropping the slack (blocks 1368 ->
    # lanes 2101) would pick 2048 — a kernel the chip budget was NOT
    # calibrated for (mutation-found in round 4: the `+ 64` was
    # otherwise unobservable; re-pinned for the round-5 packed-flag
    # model, whose per-constraint cost is 8*ceil(c/32) words).
    b96 = compile_system([Constraint.Fixed(i, 1.0) for i in range(96)],
                         n_vars=96)
    s96 = BatchSolver(b96, Config(), batch_params=True, precision="mixed",
                      pallas_coarse=True, pallas_fused=True)
    assert s96._pick_tile(16384) == 1024


def test_pick_tile_respects_vmem_budget():
    """The fused kernel's tile is capped so its ~(2*nnzL+6n+6m+8W+64)
    live (SUB, tile/SUB) f32 blocks fit the VMEM budget — nnzL being the
    SYMBOLIC Cholesky nonzero count (the kernel never materializes
    structurally-zero blocks) and W = ceil(n_cons/32) the bit-packed
    flag words (round 5; round 4 paid 4 FULL blocks per constraint);
    a 26-var topology must get a smaller tile than the 16384 default,
    and every returned tile must divide the batch (mutation-found:
    breaking the denominator disables the cap — invisible on CPU
    interpret runs, a compile-time OOM on a real chip).
    The 11.5e6 budget constant is calibrated on a real v5e against
    Mosaic's scoped-vmem accounting (round-5 probe, tools/
    vmem_probe_r5.py): every admitted (topology, tile) — 4-var/16384,
    98-var chain/1024, 146-var chain/1024, 5x5 grid/1024 — compiles and
    runs on-chip; the first beyond-model probes (194-var chain, 6x6
    grid at tile 1024) are excluded."""
    from ezpz_tpu.batch import BatchSolver
    from ezpz_tpu.ops.pallas_fleet import jtj_fill_count, n_flag_words

    cs = [Constraint.Fixed(i, float(i)) for i in range(26)]
    system = compile_system(cs, n_vars=26)
    solver = BatchSolver(system, Config(), precision="mixed")
    B = 16384
    tile = solver._pick_tile(B)
    assert tile is not None and B % tile == 0
    n, m = system.n_vars, system.n_rows
    nnz = jtj_fill_count(system)
    assert nnz == 26  # 26 decoupled Fixed rows: a purely diagonal factor
    blocks = 2 * nnz + 6 * n + 6 * m + 8 * n_flag_words(26) + 64
    assert tile * 4 * blocks <= 11.5e6
    assert tile < 16384
    # Exact value for this topology: blocks = 52+156+156+8+64 = 436,
    # 11.5e6 // 1744 = 6594 lanes -> floor to the 1024 unit = 6144, then
    # step down to the largest unit multiple dividing B=16384 -> 4096.
    # Pins the byte-per-block factor and the budget constant in BOTH
    # directions (a smaller cap silently costs grid steps, a larger one
    # VMEM-OOMs).
    assert tile == 4096

    # The round-5 chip boundary (probe table in TUNING.md §3b-ii): the
    # packed-flag kernel compiles at the minimum tile across the ENTIRE
    # gate-admissible envelope — 98-, 146- (the round-4 Mosaic
    # rejection), 194- and 254-var chains all ride tile 1024; the
    # binding ceilings are now the trace-size gates, not VMEM.
    from .test_ds_fused import _rect_chain
    for R, want in ((16, 1024), (24, 1024), (32, 1024), (42, 1024)):
        cons, x0 = _rect_chain(R)
        sysR = compile_system(cons, n_vars=len(x0))
        sR = BatchSolver(sysR, Config(), precision="mixed")
        assert sR._pick_tile(32768) == want, (R, sR._pick_tile(32768))

    # The FUSED kernel's compile-helper envelope at multi-tile grids
    # (probe, TUNING.md §3b-ii): past ~320 (n+m) carry rows the fused
    # builder declines any B above one tile — solve() then rides the
    # half-carry COARSE kernel (compiled at every probed size) with the
    # XLA refinement — while a single-tile batch keeps the fused kernel
    # (probed good on-chip to the 254-var instance cap).
    for R, nm in ((32, 388), (42, 508)):
        cons, x0 = _rect_chain(R)
        sysR = compile_system(cons, n_vars=len(x0))
        sF = BatchSolver(sysR, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
        assert sysR.n_vars + sysR.n_rows == nm
        assert sF._pallas_fused_fn(8192) is None, R
        assert sF._pallas_fused_fn(1024) is not None, R
        assert sF._pallas_coarse_fn(8192) is not None, R

    # The envelope boundary is EXCLUSIVE at exactly n+m == 320: a
    # 160-var/160-row topology keeps the multi-tile fused path
    # (mutation-found: `>` -> `>=` flipped the boundary, measurable
    # only with an exact-sum probe; the measured-good envelope tops out
    # at 292 and the measured-bad starts at 354, so 320 itself stays in).
    b160 = compile_system([Constraint.Fixed(i, 1.0) for i in range(160)],
                          n_vars=160)
    s160 = BatchSolver(b160, Config(), batch_params=True,
                       precision="mixed", pallas_fused=True)
    assert b160.n_vars + b160.n_rows == 320
    assert s160._pallas_fused_fn(2048) is not None

    # A COUPLED 26-var chain fills in: its factor is far denser than the
    # diagonal one, so the cap must shrink further (the n^2-free formula
    # still tracks true structure, not just var count).
    p = [DatumPoint(2 * i, 2 * i + 1) for i in range(13)]
    chain = [Constraint.Fixed(p[0].x_id, 0.0), Constraint.Fixed(p[0].y_id, 0.0)]
    for a, b in zip(p, p[1:]):
        chain.append(Constraint.Distance(a, b, 1.0))
    csys = compile_system(chain, n_vars=26)
    dense_nnz = jtj_fill_count(csys)
    assert 26 < dense_nnz <= 26 * 27 // 2
    s2 = BatchSolver(csys, Config(), precision="mixed")
    t2 = s2._pick_tile(B)
    blocks2 = (2 * dense_nnz + 6 * 26 + 6 * csys.n_rows
               + 8 * n_flag_words(csys.n_constraints) + 64)
    assert t2 is not None and t2 * 4 * blocks2 <= 11.5e6


def test_pallas_backend_rejection_falls_back_to_xla():
    """If a kernel the tile model admits is rejected by the backend at
    compile time (Mosaic scoped-vmem on a real chip), solve() must warn,
    cache the rejection for that batch size, and fall back to the XLA
    path — a degraded solve, never a crash (observed live: a 146-var
    chain at tile 1024 exceeded Mosaic's 16M scoped-vmem by 20K while the
    block model predicted 13.4M)."""
    import warnings as pywarnings

    from ezpz_tpu.batch import BatchSolver

    cs = [Constraint.Fixed(0, 1.0), Constraint.Fixed(1, 2.0)]
    system = compile_system(cs, n_vars=2)
    solver = BatchSolver(system, Config(), batch_params=True,
                         precision="mixed", pallas_fused=True)
    B = 1024
    x0 = jnp.zeros((B, 2))
    pars = tuple(
        jnp.tile(jnp.asarray(np.asarray(b.par)), (B, 1, 1))
        for b in system.blocks
    )

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in "
                           "memory space vmem (simulated)")

    solver._fused_runs[B] = boom
    solver._pallas_runs[B] = boom
    with pywarnings.catch_warnings(record=True) as caught:
        pywarnings.simplefilter("always")
        out = solver.solve(x0, pars)
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("rejected by the backend" in m for m in msgs), msgs
    # both kernels were rejected and cached as such; the XLA path solved
    assert solver._fused_runs[B] is None
    assert solver._pallas_runs[B] is None
    assert bool(np.asarray(out.converged).all())
    np.testing.assert_allclose(np.asarray(out.x[:, 0]), 1.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.x[:, 1]), 2.0, atol=1e-8)
    # and a repeat solve takes the XLA path silently (rejection cached)
    with pywarnings.catch_warnings(record=True) as again:
        pywarnings.simplefilter("always")
        out2 = solver.solve(x0, pars)
    assert not [w for w in again if w.category is RuntimeWarning]
    assert bool(np.asarray(out2.converged).all())
