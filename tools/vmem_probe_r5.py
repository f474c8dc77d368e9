#!/usr/bin/env python3
"""Round-5 VMEM calibration probe: compile + run the fused kernel on the
real chip for each mid-size topology at the model-picked tile (and at the
minimum tile when the model declines), recording Mosaic accept/reject.
Calibrates batch._pick_tile's budget for the bit-packed-flags kernels.

Usage: python tools/vmem_probe_r5.py [--topos chain16,chain24,...]
"""
import argparse
import os
import sys
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "benches"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topos", default=(
        "tiny4,chain4,chain8,chain16,chain24,chain32,grid4x4,grid5x5,grid6x6"))
    ap.add_argument("--B", type=int, default=None,
                    help="batch size (default: one tile)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from midsize_bench import rect_chain, rect_grid
    import ezpz_tpu as ez  # noqa: F401
    from ezpz_tpu.batch import BatchSolver
    from ezpz_tpu.config import Config
    from ezpz_tpu.constraints import Constraint
    from ezpz_tpu.models.compiled import compile_system
    from ezpz_tpu.ops.pallas_fleet import jtj_fill_count, n_flag_words

    def tiny4():
        cons = [Constraint.Fixed(0, 0.0), Constraint.Fixed(1, 0.0),
                Constraint.Distance(ez.DatumPoint(0, 1),
                                    ez.DatumPoint(2, 3), 5.0)]
        return cons, np.array([0.0, 0.0, 3.0, 4.0])

    def dense64():
        """The eligibility envelope's worst corner: 64 vars whose factor
        is (nearly) fully dense — fill right at PALLAS_MAX_FILL — with
        the instance count near the 256 cap."""
        rng = np.random.default_rng(9)
        pts = [ez.DatumPoint(2 * i, 2 * i + 1) for i in range(32)]
        cons = [Constraint.Fixed(pts[0].x_id, 0.0),
                Constraint.Fixed(pts[0].y_id, 0.0)]
        seen = set()
        for a in range(32):
            for b in range(a + 1, 32):
                seen.add((a, b))
        pairs = sorted(seen)
        rng.shuffle(pairs)
        for a, b in pairs[:252]:
            cons.append(Constraint.Distance(pts[a], pts[b],
                                            float(np.hypot(a - b, 1.0))))
        x0 = np.zeros(64)
        for i in range(32):
            x0[2 * i] = i % 8 + rng.normal(0, 0.1)
            x0[2 * i + 1] = i // 8 + rng.normal(0, 0.1)
        return cons, x0

    topos = {}
    for t in args.topos.split(","):
        t = t.strip()
        if t == "tiny4":
            topos[t] = tiny4()
        elif t == "dense64":
            topos[t] = dense64()
        elif t.startswith("grid"):
            rx, ry = (int(v) for v in t[4:].split("x"))
            topos[t] = rect_grid(rx, ry)
        elif t.startswith("chain"):
            topos[t] = rect_chain(int(t[5:]))

    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}")
    for name, (cons, x0) in topos.items():
        system = compile_system(cons, n_vars=len(x0))
        solver = BatchSolver(system, Config(), batch_params=True,
                             precision="mixed", pallas_fused=True)
        n, m = system.n_vars, system.n_rows
        nnz = solver._fill_count
        W = n_flag_words(system.n_constraints)
        blocks = 2 * nnz + 6 * n + 6 * m + 8 * W + 64
        ok_gate = solver._pallas_topology_ok()
        B = args.B or 1024
        tile = solver._pick_tile(B) if ok_gate else None
        print(f"{name}: n={n} m={m} c={system.n_constraints} fill={nnz} "
              f"blocks={blocks} gate={ok_gate} model_tile_at_B{B}={tile} "
              f"modeled_bytes={blocks * 4 * (tile or 1024)}")
        # Force-run at minimum tile regardless of the model's verdict, to
        # find the TRUE chip boundary.
        rng = np.random.default_rng(1)
        x0b = jnp.asarray(np.tile(x0, (B, 1))
                          + rng.normal(0, 0.01, (B, len(x0))))
        pars = tuple(
            jnp.tile(jnp.asarray(np.asarray(b.par)), (B, 1, 1))
            for b in system.blocks)
        fn = solver._pallas_fused_fn(B)
        if fn is None and ok_gate:
            print(f"  -> model declined tile at B={B}")
        probe = fn
        if probe is None:
            # bypass the model: try the minimum tile directly
            import ezpz_tpu.batch as batch_mod

            orig = solver._pick_tile
            solver._pick_tile = lambda b: 1024 if b % 1024 == 0 else None
            try:
                probe = solver._pallas_fused_fn(B)
            finally:
                solver._pick_tile = orig
            if probe is None:
                print("  -> ineligible even bypassing tile model "
                      "(gate/DS); skipping")
                continue
            print("  -> probing FORCED tile 1024")
        try:
            x, its, conv, sat, deg = jax.jit(probe)(x0b, pars)
            r, _dg = jax.vmap(lambda x_, *p: system.residual_and_flags(x_, p))(
                jnp.asarray(x, jnp.float64), *pars)
            rmax = float(jnp.max(jnp.abs(r)))
            print(f"  COMPILED+RAN: conv={bool(np.asarray(conv).all())} "
                  f"sat={bool(np.asarray(sat).all())} residual={rmax:.2e}")
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"  REJECTED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
