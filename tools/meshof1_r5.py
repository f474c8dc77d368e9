#!/usr/bin/env python3
"""Mesh-of-1 shard_map overhead probe (VERDICT r4 weak #5): on the real
chip, the fused kernel run through FleetSolver's shard_map over a
1-device mesh vs the plain BatchSolver — any delta bounds the
shard_map/kernel interaction cost of the multi-chip path the headline
configuration would use. Amortized interleaved protocol (fresh inputs
per dispatch, 8-deep chains, per-path medians over alternating reps).
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ezpz_tpu as ez
    from ezpz_tpu.batch import BatchSolver
    from ezpz_tpu.config import Config
    from ezpz_tpu.models.compiled import compile_system
    from ezpz_tpu.parallel import FleetSolver

    cons = [ez.Constraint.Fixed(0, 0.0), ez.Constraint.Fixed(1, 0.0),
            ez.Constraint.Distance(ez.DatumPoint(0, 1),
                                   ez.DatumPoint(2, 3), 5.0)]
    x0 = np.array([0.0, 0.0, 3.0, 4.0])
    system = compile_system(cons, n_vars=4)
    B, reps, chain = 32768, 5, 8

    rng = np.random.default_rng(7)
    x0b = jnp.asarray(np.tile(x0, (B, 1)) + rng.normal(0, 0.01, (B, 4)))
    pars = tuple(jnp.tile(jnp.asarray(np.asarray(b.par)), (B, 1, 1))
                 for b in system.blocks)

    local = BatchSolver(system, Config(), batch_params=True,
                        precision="mixed", pallas_fused=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
    fleet = FleetSolver(system, mesh=mesh, batch_params=True,
                        precision="mixed", pallas_fused=True)

    # warm + path asserts
    o1 = local.solve(x0b, pars)
    o2 = fleet.solve(x0b, pars)
    assert local._fused_runs and list(local._fused_runs.values())[0]
    assert fleet._fused_fleet_runs.get(B) is not None
    assert bool(np.asarray(o1.converged).all())
    assert bool(np.asarray(o2.converged).all())
    np.testing.assert_allclose(np.asarray(o1.x), np.asarray(o2.x),
                               rtol=0, atol=0)  # same kernel, same shard

    variants = [x0b + (k + 1) * 1e-9 for k in range(2 * reps * chain)]
    float(sum(jnp.sum(v[0]) for v in variants))

    def run_chain(solver, vs):
        t0 = time.perf_counter()
        acc = None
        for v in vs:
            s = jnp.sum(solver.solve(v, pars).x)
            acc = s if acc is None else acc + s
        float(acc)
        return time.perf_counter() - t0

    t_local, t_fleet = [], []
    for r in range(reps):
        base = 2 * r * chain
        t_local.append(run_chain(local, variants[base:base + chain]))
        t_fleet.append(run_chain(
            fleet, variants[base + chain:base + 2 * chain]))
    dl = sorted(t_local)[reps // 2] / chain
    df = sorted(t_fleet)[reps // 2] / chain
    rec = {
        "metric": "mesh_of_1_shard_map_overhead",
        "B": B, "reps": reps, "chain": chain,
        "device": str(jax.devices()[0]),
        "batch_solver_s_per_batch": dl,
        "fleet_shard_map_s_per_batch": df,
        "batch_solves_per_sec": round(B / dl, 1),
        "fleet_solves_per_sec": round(B / df, 1),
        "shard_map_overhead_frac": round(df / dl - 1.0, 4),
        "bitwise_identical_results": True,
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
