#!/usr/bin/env python3
"""Roofline / MFU accounting for the fleet solve paths (VERDICT r4 #4).

For each probed topology this measures the steady-state device rate
(amortized chained dispatches on the real chip — the tunnel sync floor
is excluded exactly as in the benches) and combines it with:

* **counted FLOPs** — a structural walk of the traced jaxpr (the
  pallas_call's inner jaxpr for the fused kernel; the jitted XLA mixed
  path's jaxpr otherwise): every elementwise arithmetic primitive
  contributes its element count, `scan`/`while_loop` bodies multiply by
  their trip counts. This counts the FLOPs the program actually EMITS
  (including predicated no-ops on converged lanes — the kernel's fixed
  trips execute them), so achieved/peak is a true utilization of issued
  work;
* **HBM bytes** — the kernel is VMEM-resident by construction, so HBM
  traffic is the one-pass streaming of inputs + outputs (packed x0/pars
  in, x/flags out), `bytes = sum(sizeof(args) + sizeof(outs))`.

Peaks used for the v5e (TPU v5 lite), from the public TPU system
documentation ("How to Scale Your Model", jax-ml.github.io/scaling-book):
bf16 MXU 197 TFLOP/s (unused here — the LM loop is elementwise VPU
work), **VPU f32 ~7.9 TFLOP/s** (8x128 lanes x 4 ALUs x ~940 MHz x 2
for FMA — the right roofline for this kernel), HBM **819 GB/s**.

Usage: python tools/roofline_r5.py [--topos tiny4,chain8,chain16]
                                   [--copies 32768] [--reps 5] [--json out]
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "benches"))

VPU_F32_PEAK = 7.9e12   # FLOP/s, v5e (see module docstring)
HBM_PEAK = 819e9        # bytes/s, v5e

# FLOPs per element for arithmetic primitives (transcendentals costed at
# their VPU microcode expansions, approximately).
_FLOP1 = {
    "add", "sub", "mul", "max", "min", "neg", "abs", "and", "or", "xor",
    "not", "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "select_n", "eq", "ne", "lt", "le", "gt", "ge", "sign", "floor",
    "ceil", "round", "is_finite", "rem",
}
_FLOPN = {"div": 4, "sqrt": 4, "rsqrt": 4, "log": 8, "exp": 8,
          "sin": 8, "cos": 8, "atan2": 16, "pow": 8, "integer_pow": 2,
          "logistic": 8, "tanh": 8}


def _size(aval):
    try:
        import math

        return math.prod(aval.shape) if aval.shape else 1
    except Exception:
        return 1


def count_flops(jaxpr, while_trips: float = 1.0) -> float:
    """Walk a jaxpr counting elementwise FLOPs. ``scan`` bodies multiply
    by their static length (the Pallas kernels' fixed-trip fori lowers to
    scan, so the fused path's count is exact, predicated no-ops
    included); data-dependent ``while`` bodies multiply by
    ``while_trips`` — pass the measured mean LM iteration count for the
    XLA mixed path, whose hot loop is a lax.while_loop."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        out_elems = max((_size(v.aval) for v in eqn.outvars), default=1)
        if name in _FLOP1:
            total += out_elems
        elif name in _FLOPN:
            total += _FLOPN[name] * out_elems
        elif name == "dot_general":
            a = eqn.invars[0].aval
            dims = eqn.params["dimension_numbers"][0][0]
            k = 1
            for d in dims:
                k *= a.shape[d]
            total += 2 * _size(eqn.outvars[0].aval) * k
        elif name == "scan":
            body = eqn.params["jaxpr"].jaxpr
            total += eqn.params["length"] * count_flops(body, while_trips)
        elif name == "while":
            body = eqn.params["body_jaxpr"].jaxpr
            total += while_trips * count_flops(body, while_trips)
        elif name == "pallas_call":
            grid = eqn.params["grid_mapping"].grid
            reps = 1
            for g in grid:
                reps *= int(g)
            total += reps * count_flops(eqn.params["jaxpr"], while_trips)
        elif name in ("pjit", "custom_jvp_call", "custom_vjp_call",
                      "closed_call", "core_call", "remat_call", "jvp",
                      "custom_vjp_call_jaxpr"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                ij = inner.jaxpr if hasattr(inner, "jaxpr") else inner
                total += count_flops(ij, while_trips)
        elif name == "cond":
            branches = eqn.params.get("branches", ())
            if branches:
                total += max(count_flops(b.jaxpr, while_trips)
                             for b in branches)
    return total


def _bytes_of(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return sum(l.size * l.dtype.itemsize for l in leaves)


def measure(name, make_fn, args, copies, reps, chain, while_trips=1.0):
    """Amortized device rate + jaxpr FLOP count + streamed bytes."""
    import jax
    import jax.numpy as jnp

    fn = make_fn
    jx = jax.make_jaxpr(fn)(*args)
    flops_batch = count_flops(jx.jaxpr, while_trips)
    jit_fn = jax.jit(fn)
    out = jit_fn(*args)
    hbm_batch = _bytes_of(args) + _bytes_of(out)

    x0 = args[0]
    # One extra variant, reserved for warmup: a timed dispatch must never
    # repeat an (executable, args) pair a remote backend could memoize.
    variants = [(x0 + (k + 1) * 1e-9,) + tuple(args[1:])
                for k in range(reps * chain + 1)]
    float(sum(jnp.sum(v[0][0]) for v in variants))  # materialize

    def one(v):
        o = jit_fn(*v)
        return jax.tree_util.tree_leaves(o)[0].sum()

    # warmup on the reserved LAST variant
    float(one(variants[-1]))
    ctimes = []
    for rep in range(reps):
        t0 = time.perf_counter()
        acc = None
        for k in range(chain):
            s = one(variants[rep * chain + k])
            acc = s if acc is None else acc + s
        float(acc)
        ctimes.append(time.perf_counter() - t0)
    dt = sorted(ctimes)[len(ctimes) // 2] / chain

    flops_rate = flops_batch / dt
    hbm_rate = hbm_batch / dt
    return {
        "name": name,
        "copies": copies,
        "counted_flops_per_batch": flops_batch,
        "flops_per_solve": round(flops_batch / copies, 1),
        "streamed_hbm_bytes_per_batch": hbm_batch,
        "device_s_per_batch": dt,
        "solves_per_sec": round(copies / dt, 1),
        "achieved_flops_per_sec": flops_rate,
        "vpu_f32_utilization": round(flops_rate / VPU_F32_PEAK, 4),
        "hbm_bytes_per_sec": hbm_rate,
        "hbm_utilization": round(hbm_rate / HBM_PEAK, 4),
        "arithmetic_intensity_flops_per_byte":
            round(flops_batch / hbm_batch, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topos", default="tiny4,chain8,chain16")
    ap.add_argument("--copies", type=int, default=32768)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-xla", dest="xla_too", action="store_false",
                    default=True,
                    help="skip the XLA mixed-path comparison rows")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from midsize_bench import rect_chain, rect_grid
    import ezpz_tpu as ez
    from ezpz_tpu.batch import BatchSolver
    from ezpz_tpu.config import Config
    from ezpz_tpu.models.compiled import compile_system

    chain = args.chain or (8 if jax.default_backend() == "tpu" else 1)

    def tiny4():
        cons = [ez.Constraint.Fixed(0, 0.0), ez.Constraint.Fixed(1, 0.0),
                ez.Constraint.Distance(ez.DatumPoint(0, 1),
                                       ez.DatumPoint(2, 3), 5.0)]
        return cons, np.array([0.0, 0.0, 3.0, 4.0])

    rows = []
    for t in args.topos.split(","):
        t = t.strip()
        if t == "tiny4":
            cons, x0 = tiny4()
        elif t.startswith("grid"):
            rx, ry = (int(v) for v in t[4:].split("x"))
            cons, x0 = rect_grid(rx, ry)
        else:
            cons, x0 = rect_chain(int(t[5:]))
        system = compile_system(cons, n_vars=len(x0))
        B = args.copies
        rng = np.random.default_rng(5)
        x0b = jnp.asarray(np.tile(x0, (B, 1))
                          + rng.normal(0, 0.01, (B, len(x0))))
        pars = tuple(
            jnp.tile(jnp.asarray(np.asarray(b.par)), (B, 1, 1))
            for b in system.blocks)

        fused = BatchSolver(system, Config(), batch_params=True,
                            precision="mixed", pallas_fused=True)
        fn = fused._pallas_fused_fn(B)
        if fn is not None:
            rows.append(measure(f"{t}+fused", fn, (x0b, pars), B,
                                args.reps, chain))
            print(json.dumps(rows[-1]))
        if args.xla_too:
            xla = BatchSolver(system, Config(), batch_params=True,
                              precision="mixed")
            c = xla.config

            def xfn(x0_, pars_, _x=xla, _c=c):
                res, sat = _x._vmapped(x0_, pars_, _c.residual_tolerance,
                                       _c.step_tolerance, _c.initial_lambda)
                return res.x, res.converged, sat

            # The XLA mixed path's hot loops are lax.while_loops: scale
            # their bodies by the measured mean LM iteration count (a
            # single multiplier across the coarse+refine loops —
            # approximate, stated in the artifact).
            o = xla.solve(x0b, pars)
            mean_iters = max(1.0, float(np.asarray(o.iterations).mean()))
            row = measure(f"{t}+xla", xfn, (x0b, pars), B,
                          args.reps, chain, while_trips=mean_iters)
            row["while_trips_scaling"] = round(mean_iters, 2)
            rows.append(row)
            print(json.dumps(rows[-1]))

    if args.json:
        doc = {
            "peaks": {"vpu_f32_flops": VPU_F32_PEAK, "hbm_bytes": HBM_PEAK,
                      "source": "v5e public specs (scaling-book); MXU "
                                "unused: the LM loop is elementwise"},
            "protocol": f"amortized {chain}-deep dispatch chains, median "
                        f"of {args.reps}; FLOPs counted from the traced "
                        "jaxpr (predicated no-op trips included); HBM = "
                        "streamed inputs+outputs (kernel is VMEM-resident)",
            "device": str(jax.devices()[0]),
            "rows": rows,
        }
        with open(args.json, "w") as f:
            json.dump(doc, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
