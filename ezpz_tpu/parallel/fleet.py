"""Fleet data-parallelism: shard a batch of independent sketches over devices.

The batch axis of ``BatchSolver`` is embarrassingly parallel — each sketch's
LM loop is independent — so the only communication is the initial scatter and
final gather. Two sharding mechanisms, by path:

* **XLA paths** (f64 and mixed-precision): the fleet jits ``BatchSolver``'s
  OWN unjitted vmapped callable with a ``NamedSharding`` over a 1-D mesh —
  XLA partitions everything along the batch axis with zero collectives in
  the hot loop, and the multi-device path is the single-device path by
  construction.
* **Fused Pallas path** (``precision="mixed"``, ``pallas_fused=True``): XLA
  cannot auto-partition a custom kernel, so the fleet wraps
  ``BatchSolver._pallas_fused_fn`` (pack -> fused coarse+DS-refine kernel ->
  unpack) in ``shard_map``: each device runs the identical kernel on its
  B/D-sketch shard. This is the single-chip headline configuration scaled
  out — per-shard results are bit-identical to a local ``BatchSolver`` on
  the same shard.

The reference has no equivalent (single-threaded CPU solve,
``ezpz/src/lib.rs:80-87``); this is the BASELINE.json multi-chip target.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from ..batch import BatchResult, BatchSolver
from ..config import Config
from ..models.compiled import CompiledSystem


class FleetSolver:
    """Solve B same-topology sketches sharded across a device mesh.

    B must be divisible by the mesh size (pad the fleet if needed); the
    fused Pallas path additionally pads each device's shard up to the
    kernel tile unit internally, exactly like ``BatchSolver``.

    ``precision`` / ``pallas_fused`` / ``pallas_trips`` / ``refine_trips``
    mirror ``BatchSolver`` — ``FleetSolver(precision="mixed",
    pallas_fused=True)`` is the fastest single-chip configuration scaled
    across the mesh. (``pallas_coarse``-only is not offered here: its f64
    refinement phase is an XLA path that shards fine, so use
    ``precision="mixed"`` for that shape.)

    On the test/CI mesh (8 faked CPU devices) a fleet of 8 sketches puts
    one sketch on each device; results are bit-identical to the local
    ``BatchSolver``:

    >>> import jax, numpy as np
    >>> from ezpz_tpu import Constraint, DatumPoint
    >>> from ezpz_tpu.models.compiled import compile_system
    >>> from ezpz_tpu.parallel import FleetSolver
    >>> p, q = DatumPoint(0, 1), DatumPoint(2, 3)
    >>> system = compile_system([Constraint.Fixed(0, 0.0),
    ...                          Constraint.Fixed(1, 0.0),
    ...                          Constraint.Distance(p, q, 4.0)], n_vars=4)
    >>> B = len(jax.devices())
    >>> x0 = np.tile([0.0, 0.0, 4.4, 4.4], (B, 1))
    >>> res = FleetSolver(system).solve(x0)
    >>> bool(np.asarray(res.converged).all())
    True
    """

    def __init__(
        self,
        system: CompiledSystem,
        mesh: Optional[Mesh] = None,
        config: Config = Config(),
        batch_params: bool = False,
        precision: str = "f64",
        pallas_fused: bool = False,
        pallas_trips: int = 4,
        refine_trips: int = 4,
    ):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("batch",))
        self.mesh = mesh
        self.system = system
        self.config = config
        self.batch_params = batch_params
        self.precision = precision
        self.pallas_fused = pallas_fused
        self._fused_fleet_runs: dict = {}

        # The local solver provides BOTH the unjitted vmapped XLA callable
        # and the per-shard fused-kernel builder; sharing them keeps fleet
        # and single-device semantics identical.
        self._local = BatchSolver(
            system, config, batch_params=batch_params, precision=precision,
            pallas_fused=pallas_fused, pallas_trips=pallas_trips,
            refine_trips=refine_trips,
        )

        batch_sharding = NamedSharding(mesh, P("batch"))
        scalar_sharding = NamedSharding(mesh, P())
        if batch_params:
            n_blocks = len(system.blocks)
            in_shardings = (
                batch_sharding,
                tuple(batch_sharding for _ in range(n_blocks)),
                scalar_sharding,
                scalar_sharding,
                scalar_sharding,
            )
        else:
            in_shardings = (batch_sharding,) + (scalar_sharding,) * 3
        self._run = jax.jit(self._local._vmapped, in_shardings=in_shardings)

    # -- fused Pallas path ----------------------------------------------------

    def _fused_fleet_run(self, B: int):
        """Per-global-batch-size cached jitted shard_map of the fused
        kernel, or None when ineligible (B not divisible by the mesh, or
        the per-shard batch/topology doesn't support the fused kernel)."""
        if B in self._fused_fleet_runs:
            return self._fused_fleet_runs[B]
        D = int(self.mesh.devices.size)
        run = None
        if B % D == 0:
            fn = self._local._pallas_fused_fn(B // D)
            if fn is not None:
                n_blocks = len(self.system.blocks)
                sm = _shard_map(
                    fn,
                    mesh=self.mesh,
                    in_specs=(P("batch"),
                              tuple(P("batch") for _ in range(n_blocks))),
                    out_specs=(P("batch"),) * 5,
                    # pallas_call's out ShapeDtypeStructs carry no varying-
                    # mesh-axes annotation; the kernel is per-shard pure
                    # (no collectives), so the vma check adds nothing here.
                    check_vma=False,
                )
                run = jax.jit(sm)
        self._fused_fleet_runs[B] = run
        return run

    def _reject_fused(self, B: int, err: Exception) -> None:
        """Cache a backend rejection of the shard-mapped fused kernel for
        this global batch size and warn once; solve() falls through to the
        sharded XLA path (mirrors ``BatchSolver._reject_pallas``)."""
        import warnings as _pywarnings

        self._fused_fleet_runs[B] = None
        _pywarnings.warn(
            f"Shard-mapped fused Pallas kernel rejected by the backend "
            f"(n_vars={self.system.n_vars}, B={B}, "
            f"devices={int(self.mesh.devices.size)}); falling back to the "
            f"sharded XLA path. Backend said: {str(err)[:200]}",
            RuntimeWarning,
        )

    def solve(self, x0: jnp.ndarray, pars: Optional[Tuple] = None,
              finish_stragglers: bool = False) -> BatchResult:
        """``finish_stragglers`` (fused path only): lanes the fixed-trip
        kernel leaves unconverged are re-solved through the local
        full-budget XLA path and merged (straggler counts are small by
        construction, so a single-device cleanup is fine)."""
        c = self.config
        if self.pallas_fused:
            D = int(self.mesh.devices.size)
            B = int(x0.shape[0])
            # Pad so every device's shard hits the kernel tile unit: the
            # per-shard padding BatchSolver does locally, lifted to the
            # mesh (pad count = D * per-shard pad).
            from ..ops.pallas_fleet import SUB

            unit = 128 * SUB * D
            Bp = max(unit, ((B + unit - 1) // unit) * unit)
            if Bp != B:
                pad = Bp - B
                x0 = jnp.asarray(x0)
                x0p = jnp.concatenate(
                    [x0, jnp.broadcast_to(x0[-1:], (pad,) + x0.shape[1:])],
                    axis=0)
                parsp = pars if pars is None else tuple(
                    jnp.concatenate(
                        [p,
                         jnp.broadcast_to(p[-1:], (pad,) + tuple(p.shape[1:]))],
                        axis=0)
                    for p in pars
                )
            else:
                x0p, parsp = jnp.asarray(x0), pars
            fused = self._fused_fleet_run(int(x0p.shape[0]))
            if fused is not None:
                try:
                    x, its, conv, sat, deg = fused(x0p, parsp)
                except Exception as e:
                    # Same safety net as BatchSolver.solve: a Mosaic
                    # compile/resource rejection the tile model missed
                    # degrades the fleet to the sharded XLA path (cached
                    # per batch size, warned once) instead of crashing
                    # the multi-device solve. Real defects propagate.
                    from ..batch import _is_backend_rejection

                    if not _is_backend_rejection(e):
                        raise
                    self._reject_fused(int(x0p.shape[0]), e)
                else:
                    out = BatchResult(
                        x=x[:B], iterations=its[:B], converged=conv[:B],
                        satisfied=sat[:B], degenerate=deg[:B],
                    )
                    if finish_stragglers:
                        out = self._local._finish_stragglers(out, x0, pars)
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
