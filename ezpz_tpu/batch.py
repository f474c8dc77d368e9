"""Scenario batching: solve thousands of same-topology sketches at once.

This is the TPU-shape of data parallelism for a constraint solver
(SURVEY.md section 2): one compiled topology, ``vmap`` over initial guesses
and per-sketch constraint parameters. Each sketch runs the exact
reference-semantics LM loop (per-sketch lambda, accept/reject, convergence);
``vmap`` of ``lax.while_loop`` runs until every sketch in the batch is done,
with converged sketches predicated out.

The reference has no equivalent — its closest artifact is the
``massive_parallel_system`` fixture, 500 independent subsystems concatenated
into one sparse matrix and solved serially (``README.md:37-41``). Here those
become a batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models.compiled import CompiledSystem
from .solver import solve_lm, solve_lm_mixed

# Topologies at or below this many lowered instances evaluate via the
# fully-unrolled (static-index, gather/scatter-free) path inside the fleet
# solvers: measured ~15% faster than the gather path on TPU for the tiny
# systems block decomposition produces. Larger topologies keep the padded
# gather path (unrolling grows the traced program linearly).
UNROLL_MAX_INSTANCES = 24

# The Pallas fleet kernels go further: their in-kernel Cholesky is
# sparsity-aware (ops/pallas_fleet._symbolic_fill emits ops only for the
# factor's structural nonzeros), so mid-size topologies — past the dense
# unroll ceiling above — still trace and compile in bounded size. The
# ceiling is trace/compile time, not VMEM (the tile shrinks with the
# symbolic nonzero count, see _pick_tile), and the factorization's trace
# size tracks the PLANNED FACTOR FILL, not the variable count — a
# 150-var banded chain traces fewer factorization ops than a dense
# 64-var sketch. Eligibility is therefore fill-based: a topology
# qualifies while its planned fill is at or below dense-64's factor
# nonzero count (PALLAS_MAX_FILL — the measured worst case that still
# traces/compiles in bounded time; round 3's ceiling was "24 dense
# instances", round 4's sparse unroll made 64 dense tractable and fill
# the right unit). PALLAS_MAX_INSTANCES bounds the residual/Jacobian row
# unroll, whose trace size tracks instance count. Since round 5 (packed
# flag words) the whole gate-admissible envelope compiles at the minimum
# tile on-chip, so these two trace-size gates ARE the binding ceilings —
# chains run fused to the 254-var instance cap; the VMEM model only
# sizes larger tiles, and the fused builder additionally declines
# multi-tile grids past ~320 (n+m) carry rows (the measured
# compile-helper envelope), handing them to the coarse kernel.
PALLAS_MAX_FILL = 64 * 65 // 2  # dense-64's lower-triangular factor nnz
PALLAS_MAX_INSTANCES = 256


def _is_backend_rejection(err: Exception) -> bool:
    """True when ``err`` is a compile/resource rejection from the TPU
    backend — the only class of error the Pallas paths may degrade to XLA
    on. Classification is by MESSAGE markers, not exception type: both
    observed real-world rejections carry them ("RESOURCE_EXHAUSTED: Ran
    out of scoped vmem" from Mosaic's accounting; "remote_compile: HTTP
    500: tpu_compile_helper subprocess exit code 1" from the compile
    helper), while a bare XlaRuntimeError can equally be a transient
    EXECUTION failure — blanket-classifying those would permanently cache
    a rejection and silently degrade every later solve at that batch
    size. Anything unmarked — packing/tracing bugs, bad user inputs,
    runtime faults — propagates."""
    msg = str(err)
    return any(tag in msg for tag in (
        "RESOURCE_EXHAUSTED", "Mosaic", "mosaic", "vmem", "VMEM",
        "remote_compile", "tpu_compile",
    ))


def _maybe_unroll(system: CompiledSystem):
    from .ops.unrolled import UnrolledSystem

    n_instances = sum(int(b.idx.shape[0]) for b in system.blocks)
    if 0 < n_instances <= UNROLL_MAX_INSTANCES:
        return UnrolledSystem(system)
    return system


def _pick_spd(system: CompiledSystem):
    """Per-topology normal-equation solver for these ALWAYS-BATCHED
    contexts, by measurement on the v5e (TUNING.md):

    * n <= 24 — fully-unrolled Crout (inside ``spd_solve``);
    * n > 24 with a narrow ordering — the O(n*bw^2) scan BAND tier
      (``ops.banded.plan_band``: identity or RCM, bw <= 32). Added in
      round 5 for the beyond-64 cliff (a 146-var chain's band is 7 wide
      while XLA's dense serialized Cholesky was 3,000x off) and then
      measured to beat the column-sweep tier across the WHOLE mid-size
      range too: 1.78M vs 294k mixed solves/sec at 26 vars, 811k vs 92k
      at 50, 433k vs 87k on the 50-var 2-D grid (amortized, B=32768);
    * 24 < n <= 64 with no narrow ordering — the matmul-free
      column-sweep tier (``spd_solve_batched``);
    * n > 64 with no narrow ordering — XLA's dense tier."""
    from .ops.linalg import (UNROLL_COL_MAX_N, UNROLL_MAX_N, spd_solve,
                             spd_solve_batched)

    n = system.n_vars
    if n > UNROLL_MAX_N:
        from .ops.banded import make_banded_spd, plan_band

        plan = plan_band(system)
        if plan is not None:
            perm, bw = plan
            return make_banded_spd(n, bw, perm)
    if UNROLL_MAX_N < n <= UNROLL_COL_MAX_N:
        return spd_solve_batched
    return spd_solve


@dataclass
class BatchResult:
    x: jnp.ndarray  # (B, n_vars)
    iterations: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,) bool
    satisfied: jnp.ndarray  # (B, n_constraints) bool
    degenerate: jnp.ndarray  # (B, n_constraints) bool


class BatchSolver:
    """A jit-compiled vmapped LM solver for one topology.

    ``pars`` (optional) is a tuple of (B, n_k, np_k) arrays aligned with
    ``system.blocks`` — per-sketch constraint parameters. Without it, all
    sketches share the compile-time parameters and only guesses vary.

    Solve three sketches of the same topology (pin p, hold q at distance 5)
    from different guesses in one vmapped call:

    >>> import numpy as np
    >>> from ezpz_tpu import Constraint, DatumPoint
    >>> from ezpz_tpu.batch import BatchSolver
    >>> from ezpz_tpu.config import Config
    >>> from ezpz_tpu.models.compiled import compile_system
    >>> p, q = DatumPoint(0, 1), DatumPoint(2, 3)
    >>> system = compile_system([Constraint.Fixed(0, 0.0),
    ...                          Constraint.Fixed(1, 0.0),
    ...                          Constraint.Distance(p, q, 5.0)], n_vars=4)
    >>> x0 = np.array([[0.0, 0.0, 3.0, 3.9],
    ...                [0.0, 0.0, 2.9, 4.1],
    ...                [0.0, 0.0, 4.1, 2.8]])
    >>> res = BatchSolver(system, Config()).solve(x0)
    >>> bool(np.asarray(res.converged).all())
    True
    >>> np.allclose(np.hypot(np.asarray(res.x)[:, 2], np.asarray(res.x)[:, 3]), 5.0)
    True
    """

    def __init__(self, system: CompiledSystem, config: Config = Config(),
                 batch_params: bool = False, precision: str = "f64",
                 pallas_coarse: bool = False, pallas_trips: int = 4,
                 pallas_fused: bool = False, refine_trips: int = 4):
        """``precision``:

        * ``"f64"`` (default) — the reference-exact f64 LM loop;
        * ``"mixed"`` — f32 LM + f64-residual refinement
          (``solve_lm_mixed``): ~6x faster on TPU (no native f64 there),
          still verified to the f64 residual tolerance, but iteration
          counts do not match the reference's pinned values.

        ``pallas_coarse`` (mixed only, small topologies): run the coarse
        f32 phase as a Pallas kernel that keeps the whole fleet state in
        VMEM for ``pallas_trips`` fixed LM iterations, then hand to the f64
        refinement. Fastest path on TPU for huge fleets of tiny sketches;
        lanes the short coarse phase leaves unconverged are finished (or
        honestly reported unconverged) by the refinement's budget. Falls
        back to the XLA coarse phase when the batch size does not tile.

        ``pallas_fused`` (mixed only, small topologies whose kernels all
        have double-single variants, ``ops.ds.DS_KERNELS``): run BOTH
        phases in one Pallas kernel — the f32 coarse LM and then
        ``refine_trips`` double-single (two-float) LM iterations to the
        full 1e-8 tolerance, entirely in VMEM. Eliminates the XLA
        refinement's emulated-f64 residual passes; convergence and
        per-constraint satisfaction are verified in double-single
        arithmetic (~1e-12 absolute at coordinate scale 1e3). Falls back
        to ``pallas_coarse`` behavior when the topology has non-DS
        kernels and to the XLA path when the batch does not tile.
        """
        assert precision in ("f64", "mixed"), precision
        if pallas_fused:
            assert precision == "mixed", "pallas_fused requires precision='mixed'"
            assert batch_params, "pallas_fused requires batch_params=True"
            pallas_coarse = True  # shared eligibility checks + fallback
        if pallas_coarse:
            assert precision == "mixed", "pallas_coarse requires precision='mixed'"
            assert batch_params, "pallas_coarse requires batch_params=True"
        self.system = system
        self.config = config
        self.batch_params = batch_params
        self.precision = precision
        self.pallas_coarse = pallas_coarse
        self.pallas_trips = pallas_trips
        self.pallas_fused = pallas_fused
        self.refine_trips = refine_trips
        self._fused_runs: dict = {}
        self._pallas_runs: dict = {}
        self._analysis_run = None
        max_iterations = config.max_iterations
        # Small topologies solve via the unrolled (static-index) evaluator.
        ev64 = _maybe_unroll(system)
        ev32 = (
            _maybe_unroll(system.astype(jnp.float32))
            if precision == "mixed" else None
        )

        # With strictly positive weights, satisfaction comes free from the
        # final weighted residual (one full f64 residual pass saved/solve).
        fast_sat = system.all_weights_positive()

        # Size-tiered normal-equation solver (column sweep / band / dense
        # — see _pick_spd).
        spd = _pick_spd(system)

        def solve_one(x0, pars, rtol, stol, lam0):
            if precision == "mixed":
                pars32 = (
                    None if pars is None
                    else tuple(p.astype(jnp.float32) for p in pars)
                )
                res = solve_lm_mixed(
                    ev64, ev32, x0, max_iterations, rtol, stol, lam0,
                    pars64=pars, pars32=pars32, spd=spd,
                )
            else:
                res = solve_lm(ev64, x0, max_iterations, rtol, stol, lam0,
                               pars=pars, spd=spd)
            if fast_sat:
                sat = system.satisfaction_from_residual(res.residual)
            else:
                sat = system.constraint_satisfaction(res.x, pars)
            return res, sat

        # The unjitted vmapped solver is kept for FleetSolver, which jits
        # the SAME callable with device shardings — guaranteeing the
        # multi-device XLA path is the single-device path by construction.
        if batch_params:
            self._vmapped = jax.vmap(solve_one, in_axes=(0, 0, None, None, None))
        else:
            self._vmapped = jax.vmap(
                lambda x0, rtol, stol, lam0: solve_one(x0, None, rtol, stol, lam0),
                in_axes=(0, None, None, None),
            )
        self._run = jax.jit(self._vmapped)

        if pallas_coarse:
            self._system32 = system.astype(jnp.float32)

            def refine_one(x1, its, deg, pars, rtol, stol, lam0):
                from .solver import solve_lm_refine

                pars32 = tuple(p.astype(jnp.float32) for p in pars)
                res = solve_lm_refine(
                    ev64, ev32, x1, its, deg, max_iterations, rtol, stol,
                    lam0, pars64=pars, pars32=pars32, spd=spd,
                )
                if fast_sat:
                    sat = system.satisfaction_from_residual(res.residual)
                else:
                    sat = system.constraint_satisfaction(res.x, pars)
                return res, sat

            self._refine_run = jax.jit(
                jax.vmap(refine_one, in_axes=(0, 0, 0, 0, None, None, None))
            )

    # -- pallas coarse phase --------------------------------------------------

    @property
    def _fill_count(self) -> int:
        """Planned-factor structural nonzero count for this topology
        (ops/pallas_fleet.jtj_fill_count), computed once and cached — it
        drives both the eligibility gate and the VMEM tile cap. Computed
        with the gate's cap as an early-exit limit: the count is exact for
        every eligible topology (and for any fill the VMEM model ever
        sees), and an over-cap topology answers ``PALLAS_MAX_FILL + 1``
        without finishing the symbolic analysis."""
        if not hasattr(self, "_fill_count_cache"):
            from .ops.pallas_fleet import jtj_fill_count

            self._fill_count_cache = jtj_fill_count(
                self.system, limit=PALLAS_MAX_FILL)
        return self._fill_count_cache

    def _pallas_topology_ok(self) -> bool:
        """Fill-based trace-size eligibility for the Pallas fleet kernels:
        the planned factor fill must stay within dense-64's (sparse
        mid-size sketches — chains, grids — qualify; fill-heavy coupling
        does not), and the instance count within the row-unroll bound.

        Ordering matters: the instance-count gate is O(#blocks) and MUST
        short-circuit before ``_fill_count`` touches the symbolic planner,
        so an oversized topology (serve points whole topology groups here)
        declines instantly instead of running a symbolic analysis first
        (tests/test_planner_gate.py pins this)."""
        n_instances = sum(int(b.idx.shape[0]) for b in self.system.blocks)
        return (0 < n_instances <= PALLAS_MAX_INSTANCES
                and self._fill_count <= PALLAS_MAX_FILL)

    def _pick_tile(self, B: int):
        from .ops.pallas_fleet import DEFAULT_TILE, SUB

        unit = 128 * SUB
        # VMEM-aware cap: the fused kernel materializes ~(2*nnzL + 6n + 6m +
        # 8*W) live (SUB, tile/SUB) f32 blocks, each tile*4 bytes —
        # the normal matrix counts by its SYMBOLIC Cholesky nonzeros (the
        # kernel never materializes structurally-zero blocks), the
        # double-single refine phase carries hi+lo pairs of x and r (hence
        # 6n/6m, conservatively shared with the coarse-only kernel), and
        # the per-constraint deg/sat flags travel BIT-PACKED as
        # W = ceil(n_cons/32) i32 words (phase-2 carries 2W, outputs 2W,
        # plus accumulator/merge temporaries — 8*W covers all of it; round
        # 4 spent 4 FULL blocks per constraint here, which is what pushed
        # 72-var grids and 146-var chains past the tile budget).
        # DEFAULT_TILE=16384 fits the 4-var headline topology comfortably;
        # larger topologies take a proportionally smaller tile instead of
        # failing to compile. (+64 blocks of slack for temporaries.)
        #
        # The model sizes tiles ABOVE the minimum: its 11.5e6 budget is
        # the round-4 on-chip calibration (every larger-tile pick —
        # 4-var/16384, 26-var/4096, 50-var/2048, 65-var/2048 — was
        # measured good against Mosaic's scoped-vmem accounting with the
        # FATTER round-4 kernel, so it is strictly safe for this one).
        # At the MINIMUM tile the round-5 probe (tools/vmem_probe_r5.py,
        # table in TUNING.md §3b-ii) showed the packed-flag kernel
        # compiles and runs on-chip across the entire gate-admissible
        # envelope — chains to 254 vars (the 256-instance cap), grids to
        # 7x7 (128 vars), and the worst corner (64 vars at the 1728/2080
        # fill cap with 254 instances, 22.5M modeled) — so eligibility
        # floors at the minimum tile instead of declining on the model's
        # (over-)estimate, and the binding limits are the trace-size
        # gates (PALLAS_MAX_FILL/PALLAS_MAX_INSTANCES). solve() still
        # falls back at runtime if the chip rejects a kernel.
        from .ops.pallas_fleet import n_flag_words

        n, m = self.system.n_vars, self.system.n_rows
        nnz = self._fill_count
        blocks = (2 * nnz + 6 * n + 6 * m
                  + 8 * n_flag_words(self.system.n_constraints) + 64)
        vmem_lanes = int(11.5e6) // (4 * blocks)
        cap = min(DEFAULT_TILE, max(unit, (vmem_lanes // unit) * unit))
        cand = min(cap, (B // unit) * unit)
        while cand >= unit:
            if B % cand == 0:
                return cand
            cand -= unit
        return None

    def _pallas_coarse_fn(self, B: int):
        """Unjitted pack -> pallas fori LM -> unpack for batch size B, or
        None when the batch doesn't tile or the topology is too large to
        unroll in a kernel. ``FleetSolver`` wraps this same callable in
        ``shard_map`` (with B = per-device batch) to scale it out."""
        # Cheap gate FIRST: _pick_tile reads _fill_count (the symbolic
        # planner), so the O(#blocks) instance-count gate inside
        # _pallas_topology_ok must short-circuit before it (serve routes
        # whole topology groups here, including oversized ones).
        if not self._pallas_topology_ok():
            return None
        tile = self._pick_tile(B)
        if tile is None:
            return None

        from .ops.pallas_fleet import (
            make_coarse_fleet_solver,
            pack_fleet,
            unpack_flag_rows,
            unpack_rows,
        )

        c = self.config
        kernel_run = make_coarse_fleet_solver(
            self._system32,
            # The kernel's fixed trip count respects the iteration budget.
            min(self.pallas_trips, c.max_iterations),
            # O(1)-coordinate coarse tolerance; the kernel scales it (and
            # floors the step tolerance) per lane by max(1, |x0|_inf) —
            # solve_lm_mixed's scaling, computed in-kernel.
            5e-6,
            float(c.step_tolerance),
            float(c.initial_lambda),
            tile=tile,
            # Mosaic only targets TPU; everywhere else runs the (slow but
            # correct) interpreter — tests use it on CPU.
            interpret=(jax.default_backend() != "tpu"),
        )

        def run(x0, pars):
            x_p, pars_p = pack_fleet(x0.astype(jnp.float32), self._system32, pars)
            xp, itp, _convp, degp = kernel_run(x_p, pars_p)
            x1 = unpack_rows(xp)                       # (B, n) f32
            its = unpack_rows(itp)[:, 0]               # (B,) i32
            # Flags travel bit-packed (32 constraints/word) through the
            # kernel; expand to (B, n_cons) bool here.
            deg = unpack_flag_rows(degp, self.system.n_constraints)
            return x1, its, deg

        return run

    def _pallas_coarse_run(self, B: int):
        """Per-batch-size cached, jitted ``_pallas_coarse_fn`` (or None)."""
        if B not in self._pallas_runs:
            fn = self._pallas_coarse_fn(B)
            self._pallas_runs[B] = None if fn is None else jax.jit(fn)
        return self._pallas_runs[B]

    def _pallas_fused_fn(self, B: int):
        """Unjitted fused (coarse + double-single refine) kernel wrapper for
        batch size B. Returns None when the batch doesn't tile, the topology
        is too large, or a kernel lacks a DS variant (-> coarse/XLA
        fallback). ``FleetSolver`` wraps this same callable in ``shard_map``
        (with B = per-device batch) to scale the fused path out."""
        from .ops.pallas_fleet import (
            _ds_instance_list,
            make_fused_fleet_solver,
            pack_fleet_ds,
            unpack_flag_rows,
            unpack_rows,
        )

        # Cheap gates FIRST (same ordering rule as _pallas_coarse_fn):
        # the instance-count gate and the O(#instances) DS-variant check
        # both run before _pick_tile forces the symbolic planner.
        if (not self._pallas_topology_ok()
                or _ds_instance_list(self._system32) is None):
            return None
        # Compile-helper envelope at MULTI-tile grids (round-5 probe,
        # TUNING.md §3b-ii): the FUSED kernel's phase-2 carry spans
        # ~2(n+m) rows, and past ~320 (n+m) it compiles only at a
        # single-tile grid in this environment — chain24 (n+m=292) and
        # grid6x6 (268) ride grid 8 fine; chain32 (388) crashed the TPU
        # compile helper at B=2048 AND 8192, chain42/grid7x7 at 8192.
        # Decline multi-tile fused picks for them up front: solve() then
        # tries the (half-carry) COARSE kernel, which compiled at every
        # probed size, and keeps its f64 refinement on XLA.
        from .ops.pallas_fleet import SUB as _SUB

        if (self.system.n_vars + self.system.n_rows > 320
                and B != 128 * _SUB):
            return None
        tile = self._pick_tile(B)
        if tile is None:
            return None

        c = self.config
        kernel_run = make_fused_fleet_solver(
            self._system32,
            min(self.pallas_trips, c.max_iterations),
            self.refine_trips,
            c.max_iterations,
            # O(1)-coordinate coarse tolerance; scaled per lane in-kernel
            # by max(1, |x0|_inf) with a 1e-7*scale step floor (the refine
            # phase targets the ABSOLUTE f64 tolerances below).
            5e-6,
            float(c.residual_tolerance),
            float(c.step_tolerance),
            float(c.step_tolerance),
            float(c.initial_lambda),
            tile=tile,
            interpret=(jax.default_backend() != "tpu"),
        )

        def run(x0, pars):
            from .ops.ds import join_f64

            xhi_p, xlo_p, parhi_p, parlo_p = pack_fleet_ds(
                jnp.asarray(x0, jnp.float64), self._system32, pars)
            xhp, xlp, itp, convp, satp, degp = kernel_run(
                xhi_p, xlo_p, parhi_p, parlo_p)
            x = join_f64(unpack_rows(xhp), unpack_rows(xlp))  # (B, n) f64
            its = unpack_rows(itp)[:, 0]
            conv = unpack_rows(convp)[:, 0] > 0
            # Flags travel bit-packed (32 constraints/word) through the
            # kernel; expand to (B, n_cons) bool here.
            n_cons = self.system.n_constraints
            sat = unpack_flag_rows(satp, n_cons)
            deg = unpack_flag_rows(degp, n_cons)
            return x, its, conv, sat, deg

        return run

    def _pallas_fused_run(self, B: int):
        """Per-batch-size cached, jitted ``_pallas_fused_fn`` (or None)."""
        if B not in self._fused_runs:
            fn = self._pallas_fused_fn(B)
            self._fused_runs[B] = None if fn is None else jax.jit(fn)
        return self._fused_runs[B]

    def _pad_to_tile(self, x0, pars):
        """Pad the batch up to the kernel tile unit (1024 lanes) by
        repeating the last sketch, so batches with ``B % 1024 != 0`` still
        take the Pallas fast path instead of silently falling back to XLA.
        Returns ``(x0_padded, pars_padded, B_original)``; callers slice
        results back to ``B_original``. Padded lanes are real solves of a
        duplicated sketch — no NaN or divergence risk."""
        from .ops.pallas_fleet import SUB

        B = int(x0.shape[0])
        unit = 128 * SUB
        Bp = max(unit, ((B + unit - 1) // unit) * unit)
        if Bp == B:
            return jnp.asarray(x0), pars, B
        x0 = jnp.asarray(x0)
        pad = Bp - B
        x0p = jnp.concatenate(
            [x0, jnp.broadcast_to(x0[-1:], (pad,) + x0.shape[1:])], axis=0)
        parsp = pars if pars is None else tuple(
            jnp.concatenate(
                [p, jnp.broadcast_to(p[-1:], (pad,) + tuple(p.shape[1:]))],
                axis=0)
            for p in pars
        )
        return x0p, parsp, B

    def _reject_pallas(self, which: str, B: int, err: Exception) -> None:
        """A Pallas kernel the eligibility model admitted was rejected by
        the backend (in practice: Mosaic's scoped-vmem accounting on a real
        chip exceeding the 16M limit where the tile model predicted a fit).
        Cache the rejection so this batch size never retries the kernel,
        warn once, and let solve() continue to the XLA path — degraded
        throughput, never a crash."""
        import warnings as _pywarnings

        cache = self._fused_runs if which == "fused" else self._pallas_runs
        cache[B] = None
        _pywarnings.warn(
            f"Pallas {which} kernel rejected by the backend for this "
            f"topology (n_vars={self.system.n_vars}, planned fill="
            f"{self._fill_count}, B={B}); falling back to the XLA path. "
            f"Backend said: {str(err)[:200]}",
            RuntimeWarning,
        )

    def _finish_stragglers(self, result: BatchResult, x0, pars) -> BatchResult:
        """Re-solve the lanes the fixed-trip Pallas kernel left unconverged
        through the full-budget XLA path (restarting from their original
        guesses — the plain ``precision="mixed"`` semantics) and merge.

        Costs one device->host transfer of the converged mask per batch;
        when every lane converged (the common near-solution fleet) nothing
        else runs. Straggler counts are padded to the next power of two so
        repeat calls don't recompile per distinct count."""
        conv = np.asarray(result.converged)
        if conv.all():
            return result
        c = self.config
        idx = np.flatnonzero(~conv)
        m = 1 << (len(idx) - 1).bit_length()
        idxp = np.concatenate([idx, np.full(m - len(idx), idx[-1], idx.dtype)])
        x0j = jnp.asarray(x0)
        args = (x0j[idxp],)
        if self.batch_params:
            args += (tuple(jnp.asarray(p)[idxp] for p in pars),)
        res, sat = self._run(
            *args, c.residual_tolerance, c.step_tolerance, c.initial_lambda
        )
        k = len(idx)
        return BatchResult(
            x=jnp.asarray(result.x).at[idx].set(res.x[:k]),
            iterations=jnp.asarray(result.iterations).at[idx].set(
                res.iterations[:k]),
            converged=jnp.asarray(result.converged).at[idx].set(
                res.converged[:k]),
            satisfied=jnp.asarray(result.satisfied).at[idx].set(sat[:k]),
            degenerate=jnp.asarray(result.degenerate).at[idx].set(res.deg[:k]),
        )

    def solve(self, x0: jnp.ndarray, pars: Optional[Tuple] = None,
              finish_stragglers: bool = False) -> BatchResult:
        """``finish_stragglers`` (Pallas paths only): lanes the fixed-trip
        kernel leaves unconverged — fleets starting far from the solution
        can need more LM iterations than ``pallas_trips + refine_trips`` —
        are transparently re-solved through the full-budget XLA path and
        merged, at the cost of one converged-mask transfer per batch. Off
        by default: the flags are already honest, and latency-critical
        callers may prefer no mid-solve host sync."""
        c = self.config
        if self.pallas_fused:
            x0p, parsp, B = self._pad_to_tile(x0, pars)
            fused = self._pallas_fused_run(int(x0p.shape[0]))
            if fused is not None:
                try:
                    x, its, conv, sat, deg = fused(x0p, parsp)
                except Exception as e:
                    if not _is_backend_rejection(e):
                        raise  # real defect, not a Mosaic compile rejection
                    self._reject_pallas("fused", int(x0p.shape[0]), e)
                else:
                    out = BatchResult(
                        x=x[:B], iterations=its[:B], converged=conv[:B],
                        satisfied=sat[:B], degenerate=deg[:B],
                    )
                    if finish_stragglers:
                        out = self._finish_stragglers(out, x0, pars)
                    return out
        if self.pallas_coarse:
            x0p, parsp, B = self._pad_to_tile(x0, pars)
            coarse = self._pallas_coarse_run(int(x0p.shape[0]))
            if coarse is not None:
                try:
                    x1, its, deg = coarse(x0p, parsp)
                except Exception as e:
                    if not _is_backend_rejection(e):
                        raise  # real defect, not a Mosaic compile rejection
                    self._reject_pallas("coarse", int(x0p.shape[0]), e)
                else:
                    res, sat = self._refine_run(
                        x1, its, deg, parsp,
                        c.residual_tolerance, c.step_tolerance,
                        c.initial_lambda,
                    )
                    out = BatchResult(
                        x=res.x[:B], iterations=res.iterations[:B],
                        converged=res.converged[:B],
                        satisfied=sat[:B], degenerate=res.deg[:B],
                    )
                    if finish_stragglers:
                        out = self._finish_stragglers(out, x0, pars)
                    return out
        args = (x0,) + ((pars,) if self.batch_params else ())
        res, sat = self._run(
            *args, c.residual_tolerance, c.step_tolerance, c.initial_lambda
        )
        return BatchResult(
            x=res.x,
            iterations=res.iterations,
            converged=res.converged,
            satisfied=sat,
            degenerate=res.deg,
        )

    def solve_analysis(self, x0: jnp.ndarray, pars: Optional[Tuple] = None):
        """Solve the batch AND run freedom (DoF) analysis per sketch —
        the batched ``solve_analysis`` (``ezpz/src/lib.rs:134-144``,
        ``solver/find_dof.rs:15-104``) the reference computes one host QR
        at a time. Here the B dense Jacobians at the solved points and
        their nullspace participations are computed in ONE vmapped device
        SVD pass and ONE device->host transfer (loop-equivalence tested).

        Returns ``(BatchResult, [FreedomAnalysis] * B)``.
        """
        from .dof import participation_device, underconstrained_from_participation
        from .utils.errors import EmptySystemNotAllowed

        system = self.system
        if min(system.n_rows, system.n_vars) == 0:
            raise EmptySystemNotAllowed()
        res = self.solve(x0, pars)
        if self._analysis_run is None:
            if self.batch_params:
                fn = lambda x, p: participation_device(
                    system.jacobian_dense(x, p))
                self._analysis_run = jax.jit(jax.vmap(fn))
            else:
                fn = lambda x: participation_device(system.jacobian_dense(x))
                self._analysis_run = jax.jit(jax.vmap(fn))
        args = (res.x,) + ((pars,) if self.batch_params else ())
        parts, _null = self._analysis_run(*args)
        parts = np.asarray(parts)
        analyses = [underconstrained_from_participation(parts[i])
                    for i in range(parts.shape[0])]
        return res, analyses


class MultiTopologySolver:
    """Solve several same-config batches of DIFFERENT topologies in ONE
    jitted call.

    A decomposed system (``models.blocks``) yields one batch per topology
    bucket; dispatching them as separate executables costs one host->device
    round trip each — tens of milliseconds over a remote-tunnel backend and
    a missed opportunity for XLA to overlap the buckets' compute. This
    fuses every bucket's vmapped LM loop into a single XLA computation.

    ``systems``: list of CompiledSystem. ``solve`` takes equal-length lists
    of initial-guess batches and per-sketch parameter tuples.
    """

    def __init__(self, systems, config: Config = Config(),
                 precision: str = "f64"):
        assert precision in ("f64", "mixed"), precision
        self.systems = list(systems)
        self.config = config
        max_iterations = config.max_iterations
        systems32 = [
            s.astype(jnp.float32) if precision == "mixed" else None
            for s in self.systems
        ]

        def run(x0s, parss, rtol, stol, lam0):
            outs = []
            for system, system32, x0b, pars in zip(
                self.systems, systems32, x0s, parss
            ):
                fast_sat = system.all_weights_positive()
                ev64 = _maybe_unroll(system)
                ev32 = _maybe_unroll(system32) if system32 is not None else None
                spd = _pick_spd(system)

                def one(x0, p, system=system, ev64=ev64, ev32=ev32,
                        fast_sat=fast_sat, spd=spd):
                    if precision == "mixed":
                        p32 = tuple(q.astype(jnp.float32) for q in p)
                        res = solve_lm_mixed(
                            ev64, ev32, x0, max_iterations, rtol, stol,
                            lam0, pars64=p, pars32=p32, spd=spd,
                        )
                    else:
                        res = solve_lm(ev64, x0, max_iterations, rtol, stol,
                                       lam0, pars=p, spd=spd)
                    if fast_sat:
                        sat = system.satisfaction_from_residual(res.residual)
                    else:
                        sat = system.constraint_satisfaction(res.x, p)
                    return res, sat

                outs.append(jax.vmap(one)(x0b, pars))
            return outs

        self._run = jax.jit(run)

    def solve(self, x0s, parss):
        c = self.config
        outs = self._run(list(x0s), list(parss), c.residual_tolerance,
                         c.step_tolerance, c.initial_lambda)
        return [
            BatchResult(x=res.x, iterations=res.iterations,
                        converged=res.converged, satisfied=sat,
                        degenerate=res.deg)
            for res, sat in outs
        ]
