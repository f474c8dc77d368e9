"""Coupled-system benchmark: the reference capability the block-diagonal
headline does NOT cover.

The reference's massive fixture decomposes into independent 4-var sketches;
its OTHER capability is one big genuinely-coupled sparse system through
faer's sparse LLT (``ezpz/src/solver/newton.rs:87-102``). This benchmark
solves the `coupled` generator's chain (``tools/gen_massive.py N coupled``:
N vertical lines, neighbors chained by lines_equal_length — NOT
block-diagonal) with ``BlockSchurSolver`` (single-chip partitioned Schur),
batched over perturbed copies, verified at the f64 1e-8 inf-norm residual.

Prints one JSON line. Use --out to also write an artifact file.

    python benches/coupled_bench.py                 # TPU (or whatever jax picks)
    python benches/coupled_bench.py --cpu --lines 100 --copies 4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def build_problem(lines: int):
    import numpy as np

    from ezpz_tpu.textual import Problem

    txt = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "gen_massive.py"),
         str(lines), "coupled"],
        capture_output=True, text=True, check=True).stdout
    cs = Problem.from_str(txt).to_constraint_system()
    constraints = [r.constraint for r in cs.constraints]
    x0 = np.zeros(len(cs.initial_guesses))
    for vid, val in cs.initial_guesses:
        x0[vid] = val
    return constraints, x0


def run(lines: int = 600, copies: int = 64, precision: str = "mixed",
        reps: int = 5, n_parts=None, boundary_solver: str = "dense",
        latency: bool = False) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ezpz_tpu.parallel import BlockSchurSolver

    constraints, x0 = build_problem(lines)
    n_vars = len(x0)
    solver = BlockSchurSolver(constraints, n_vars, precision=precision,
                              n_parts=n_parts, boundary_solver=boundary_solver)
    x0s = jnp.tile(jnp.asarray(x0), (copies, 1))

    # Warmup/compile + correctness gate. Distinct inputs per rep: a
    # remote-tunnel backend may memoize identical (executable, args) calls.
    res, sat = solver.solve_batch(x0s)
    ok = bool(np.asarray(res.converged).all())
    sat_ok = bool(np.asarray(sat).all())
    iters = int(np.asarray(res.iterations).max())
    rinf = float(jnp.max(jnp.abs(res.residual)))
    if not (ok and sat_ok):
        return {"error": "did not converge/satisfy", "converged": ok,
                "satisfied": sat_ok}

    times = []
    for k in range(reps):
        xv = x0s + (k + 1) * 1e-9
        t0 = time.perf_counter()
        r, _s = solver.solve_batch(xv)
        float(jnp.sum(r.x))  # force full materialization through the tunnel
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    # Amortized pipeline rate (the headline, as in bench.py/midsize): the
    # sync protocol above pays this environment's ~30 ms device->host
    # round trip per batch, a large fraction of the whole batch time;
    # chaining BENCH_CHAIN dispatches (fresh inputs each) behind ONE
    # final scalar sync measures the steady-state device rate. Off-TPU
    # (no tunnel) the chain defaults to 1 and both numbers coincide.
    chain = int(os.environ.get(
        "BENCH_CHAIN", "8" if jax.default_backend() == "tpu" else "1"))
    ctimes = []
    for rep in range(reps):
        t0 = time.perf_counter()
        acc = None
        for k in range(chain):
            r, _s = solver.solve_batch(x0s + (reps + rep * chain + k + 1) * 1e-9)
            s_ = jnp.sum(r.x)
            acc = s_ if acc is None else acc + s_
        float(acc)
        ctimes.append(time.perf_counter() - t0)
    cdt = sorted(ctimes)[len(ctimes) // 2]

    # batch=1 latency: one synchronous coupled solve (warm), the
    # interactive-use complement of the batched throughput number —
    # plus its PIPELINED variant (chained single-solve dispatches, one
    # final sync), which excludes the per-solve tunnel round trip the
    # sync number pays (the reference's in-process CLI pays neither,
    # ezpz-cli/src/main.rs:96-100).
    lat_us = lat_pipelined_us = None
    if latency:
        import jax.numpy as jnp

        solver.solve(x0)  # compile the unbatched executable
        lts = []
        for k in range(reps):
            t0 = time.perf_counter()
            solver.solve(np.asarray(x0) + (k + 1) * 1e-9)
            lts.append(time.perf_counter() - t0)
        lat_us = round(sorted(lts)[len(lts) // 2] * 1e6, 1)
        # Pipelined: drive the underlying jitted executable directly
        # (solver.solve materializes every output to host, forcing a
        # sync per call); chain dispatches, sync once on a scalar.
        if solver._solve_one is not None:
            c2 = solver.config
            plts = []
            for rep in range(reps):
                t0 = time.perf_counter()
                acc = None
                for k in range(chain):
                    res, _sat = solver._solve_one(
                        jnp.asarray(x0) + (reps + rep * chain + k + 1) * 1e-9,
                        c2.residual_tolerance, c2.step_tolerance,
                        c2.initial_lambda)
                    s = jnp.sum(res.x)
                    acc = s if acc is None else acc + s
                float(acc)
                plts.append(time.perf_counter() - t0)
            lat_pipelined_us = round(
                sorted(plts)[len(plts) // 2] / chain * 1e6, 1)

    return {
        "metric": "coupled_system_solves_per_sec",
        "value": round(chain * copies / cdt, 2),
        "unit": "solves/sec",
        "sync_solves_per_sec": round(copies / dt, 2),
        "chain": chain,
        "batch1_latency_us": lat_us,
        "batch1_latency_pipelined_us": lat_pipelined_us,
        # Report the RESOLVED choice ("auto" picks structurally at build).
        "boundary_solver": solver.boundary_solver,
        "detail": {
            "system": f"{n_vars} vars / {len(constraints)} eqs coupled chain"
                      f" x {copies} copies (NOT block-diagonal)",
            "precision": precision + " (residual verified in float64)",
            "residual_tolerance": 1e-8,
            "final_residual_inf": rinf,
            "lm_iterations": iters,
            "n_parts": solver.P,
            "n_boundary": solver.n_b,
            "ms_per_batch": round(dt * 1e3, 1),
            "amortized_ms_per_batch": round(cdt / chain * 1e3, 1),
            "device": str(jax.devices()[0]),
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=600)
    ap.add_argument("--copies", type=int, default=64)
    ap.add_argument("--precision", choices=["mixed", "f64"], default="mixed")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n-parts", type=int, default=None)
    ap.add_argument("--boundary", choices=["dense", "cg", "banded", "auto"],
                    default="dense")
    ap.add_argument("--latency", action="store_true",
                    help="also measure batch=1 synchronous latency")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None, help="also write JSON artifact here")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import ezpz_tpu

    ezpz_tpu.enable_compilation_cache(os.path.join(HERE, ".jax_cache"))
    out = run(args.lines, args.copies, args.precision, args.reps,
              n_parts=args.n_parts, boundary_solver=args.boundary,
              latency=args.latency)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if "error" not in out else 1


if __name__ == "__main__":
    sys.exit(main())
