"""Headline benchmark: massive_parallel_system solve throughput.

Solves M independent copies of the reference's massive_parallel_system
fixture (600 blocks x 4 vars = 2400 vars, 2400 eqs) per jitted call, batched
along the component axis (600*M sketches), in float64 to the reference's
1e-8 residual tolerance. Prints one JSON line:

    {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

Baseline: the reference solves this fixture at 339 solves/sec on a dev
machine (README.md:37-41; 2,943 us/solve, 2 LM iterations).
"""

import json
import os
import sys
import time

BASELINE_SOLVES_PER_SEC = 339.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ezpz_tpu  # noqa: F401  (x64 on)

    # Persistent compilation cache: works through the remote-tunnel backend
    # (measured 3.8s -> 0.76s for a cached executable) and makes repeated
    # bench runs warm-start instead of paying minutes of XLA compile.
    ezpz_tpu.enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    from ezpz_tpu.config import Config
    from ezpz_tpu.models.blocks import build_buckets
    from ezpz_tpu.textual import Problem

    here = os.path.dirname(os.path.abspath(__file__))
    fixture = os.path.join(here, "tests", "cases", "massive_parallel_system", "problem.md")
    txt = open(fixture).read()
    cs = Problem.from_str(txt).to_constraint_system()
    constraints = [r.constraint for r in cs.constraints]
    x0 = np.zeros(len(cs.initial_guesses))
    for vid, val in cs.initial_guesses:
        x0[vid] = val
    n_vars = len(x0)

    # Decompose the fixture into its component blocks and batch M copies of
    # the whole system along the component axis.
    buckets = build_buckets(constraints, n_vars)
    # Operating point from the round-4 sweep (M x K, one v5e): M=8192
    # copies with a 32-deep dispatch chain per sync measures 582k
    # solves/sec vs 354-392k for M=32768 with one sync per batch — the
    # sync protocol pays the ~30 ms tunnel round trip per rep, the
    # chained protocol only once, and smaller batches pipeline better
    # (lower HBM pressure across in-flight dispatches).
    M = int(os.environ.get("BENCH_COPIES", "8192"))

    # Mixed precision: f32 LM + f64-residual refinement (solve_lm_mixed).
    # TPUs have no native f64; the refinement still verifies the final
    # residual at the reference's 1e-8 inf-norm tolerance in f64. Buckets
    # dispatch as separate executables: measured FASTER than fusing them
    # into one jitted module (122k vs 101k solves/sec) — two in-flight
    # dispatches pipeline; one serialized module does not.
    precision = os.environ.get("BENCH_PRECISION", "mixed")
    from ezpz_tpu.batch import BatchSolver

    # Each dispatch gets ITS OWN perturbed initial-guess batch: a
    # remote-tunnel backend may memoize identical (executable, args)
    # calls, which would fake the timing. Offsets of ~1e-9 don't change
    # iteration counts. The perturbation is computed ON DEVICE inside the
    # timed region (a 161-variant pre-build would need ~25 GB host-side;
    # the measured rates include this ~1 ms/batch of extra device work).
    reps = int(os.environ.get("BENCH_REPS", "5"))
    # The coarse phase runs as the Pallas VMEM-resident fori-loop kernel
    # (ops/pallas_fleet.py) by default — measured ~40% faster end to end
    # than the XLA while_loop coarse phase (BENCH_PALLAS=0 to compare).
    pallas_coarse = os.environ.get("BENCH_PALLAS", "1") not in ("", "0")
    # The FULLY-fused kernel (coarse + in-kernel double-single refinement,
    # no XLA refine pass at all) — measured 319k vs 233k solves/sec on the
    # v5e (1.37x over coarse+XLA-refine). BENCH_FUSED=0 to compare.
    pallas_fused = os.environ.get("BENCH_FUSED", "1") not in ("", "0")
    # Trip counts tuned on the v5e for this fixture: 3 coarse + 2 refine
    # (332.7k/s) vs the library defaults 4 + 4 (319.3k/s).
    pallas_trips = int(os.environ.get("BENCH_PALLAS_TRIPS", "3"))
    refine_trips = int(os.environ.get("BENCH_REFINE_TRIPS", "2"))
    solvers = []
    for bucket in buckets:
        solver = BatchSolver(bucket.system, Config(), batch_params=True,
                             precision=precision,
                             pallas_coarse=pallas_coarse and precision == "mixed",
                             pallas_fused=pallas_fused and precision == "mixed",
                             pallas_trips=pallas_trips,
                             refine_trips=refine_trips)
        # Tile ON DEVICE: uploading the pre-tiled (M*components, ...) host
        # arrays moves hundreds of MB through the remote tunnel; uploading
        # the per-component template (KBs) and tiling with jnp is instant.
        x0b = jnp.tile(jnp.asarray(x0[bucket.var_index]), (M, 1))
        pars = tuple(jnp.tile(jnp.asarray(p), (M, 1, 1)) for p in bucket.pars)
        solvers.append((solver, x0b, pars))

    def dispatch(k):
        """One batch solve on the k-th perturbed inputs; returns the outs
        and a scalar that depends on every output (forcing execution)."""
        outs = [s.solve(xb + (k * 1e-9), pb) for s, xb, pb in solvers]
        total = outs[0].x.sum()
        for o in outs[1:]:
            total = total + o.x.sum()
        return outs, total

    def run_once(k):
        outs, total = dispatch(k)
        # Force full materialization on host: with a remote-tunnel backend,
        # block_until_ready alone does not guarantee execution finished.
        # ONE combined scalar -> one host round trip instead of one per
        # bucket (each costs tens of ms through the tunnel).
        float(total)
        return outs

    # Warm up (compile) + correctness gate. The warmup's variant index is
    # the first one PAST the timed region's indices (sync reps use
    # [0, reps); the amortized chains use [reps, reps*(chain+1))), so its
    # perturbation stays at the same ~1e-7 scale as the timed dispatches —
    # the convergence gate and reported lm_iterations are measured at the
    # same starting-point scale the timing sees.
    chain = int(os.environ.get(
        "BENCH_CHAIN", "32" if jax.default_backend() == "tpu" else "1"))
    outs = run_once(reps * (chain + 1) + 1)
    ok = all(bool(np.asarray(o.converged).all()) for o in outs)
    sat = all(bool(np.asarray(o.satisfied).all()) for o in outs)
    iters = max(int(np.asarray(o.iterations).max()) for o in outs)
    # Independent f64 verification of the warmup answers (outside the
    # timed region): the fused path verifies convergence in double-single
    # arithmetic; this recomputes the TRUE f64 residual for every copy.
    rmax = 0.0
    for (solver, _xv, pb), o in zip(solvers, outs):
        system = solver.system
        r, _deg = jax.vmap(lambda x, *p: system.residual_and_flags(x, p))(
            jnp.asarray(o.x, jnp.float64), *pb)
        rmax = max(rmax, float(jnp.max(jnp.abs(r))))
    ok = ok and rmax <= 1e-8
    if not (ok and sat):
        print(json.dumps({"metric": "massive_parallel_system_solves_per_sec",
                          "value": 0.0, "unit": "solves/sec", "vs_baseline": 0.0,
                          "error": "did not converge/satisfy"}))
        return 1

    # Timed region: per-rep times, median reported (robust to transient
    # remote-tunnel contention). Two protocols, as in the per-case latency
    # bench: `sync` = one host sync per batch (pays the ~30 ms tunnel
    # round trip every rep — through this environment the round trip is
    # comparable to the device time for the whole batch); `amortized` =
    # BENCH_CHAIN dispatches per sync, fresh inputs each, one final
    # scalar sync depending on every output — the steady-state pipeline
    # rate, the closest analog of the reference CLI's in-process
    # 100-resolve hot loop (ezpz-cli/src/main.rs:96-100), reported as the
    # headline. EZPZ_TPU_PROFILE_DIR captures a jax.profiler trace (the
    # TPU analog of the reference's `just flamegraph`, justfile:35-36).
    profile_dir = os.environ.get("EZPZ_TPU_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    times = []
    for k in range(reps):
        t0 = time.perf_counter()
        run_once(k)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    ctimes = []
    for rep in range(reps):
        t0 = time.perf_counter()
        acc = None
        for k in range(chain):
            _outs, total = dispatch(reps + rep * chain + k)
            acc = total if acc is None else acc + total
        float(acc)
        ctimes.append(time.perf_counter() - t0)
    cdt = sorted(ctimes)[len(ctimes) // 2]
    if profile_dir:
        jax.profiler.stop_trace()
    sync_solves_per_sec = M / dt
    solves_per_sec = chain * M / cdt

    detail = {
        "system": "2400 vars / 2400 eqs x %d copies" % M,
        "dtype": precision + (" + ds-fused kernel" if pallas_fused else "")
        + " (residual verified in float64, max %.1e)" % rmax,
        "residual_tolerance": 1e-8,
        "lm_iterations": iters,
        "device": str(jax.devices()[0]),
        "sketch_solves_per_sec": round(solves_per_sec * 600, 0),
        "protocol": "amortized: %d dispatches/sync (fresh inputs each, one "
                    "final scalar sync over all outputs) — steady-state "
                    "pipeline rate, the analog of the reference CLI's "
                    "in-process hot loop; sync rate below pays one ~30 ms "
                    "tunnel round trip per batch" % chain,
        "sync_solves_per_sec": round(sync_solves_per_sec, 1),
    }

    # Second headline: the genuinely COUPLED (non-block-diagonal) massive
    # system via the partitioned-Schur solver — the reference capability
    # the block-diagonal fixture does not exercise (newton.rs:87-102).
    if os.environ.get("BENCH_COUPLED", "1") not in ("", "0"):
        sys.path.insert(0, os.path.join(here, "benches"))
        from coupled_bench import run as coupled_run

        # Tuned operating point: the exact banded-direct boundary at
        # n_parts=120 (COUPLED_r03 sweep: 3,360 solves/sec vs 2,037-2,182
        # Jacobi-PCG and 877 for the r02 dense/n_parts=60 config; the
        # chain's boundary Schur complement is block-tridiagonal, bw=11,
        # so the banded solve is exact) at copies=1024 (round-5 re-sweep:
        # 256 -> 6,449/s, 512 -> 8,108, 1024 -> 8,297, 2048 -> 8,453 —
        # the knee; per-batch fixed cost amortizes and memory stays low).
        detail["coupled"] = coupled_run(
            lines=600, copies=int(os.environ.get("BENCH_COUPLED_COPIES", "1024")),
            precision="mixed", reps=3,
            n_parts=int(os.environ.get("BENCH_COUPLED_PARTS", "120")),
            boundary_solver=os.environ.get("BENCH_COUPLED_BOUNDARY", "banded"),
            # batch=1 synchronous latency rides along (~3 warm solves):
            # the interactive-use complement of the batched rate, asked
            # for by two rounds of review and previously always null.
            latency=True)

    print(json.dumps({
        "metric": "massive_parallel_system_solves_per_sec",
        "value": round(solves_per_sec, 1),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 3),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
