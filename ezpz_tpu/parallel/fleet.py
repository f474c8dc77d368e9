"""Fleet data-parallelism: shard a batch of independent sketches over devices.

The batch axis of ``BatchSolver`` is embarrassingly parallel — each sketch's
LM loop is independent — so the only communication is the initial scatter and
final gather. We lay the batch out with a ``NamedSharding`` over a 1-D mesh
and jit the vmapped solver; XLA partitions everything along the batch axis
with zero collectives in the hot loop.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import BatchResult, _maybe_unroll
from ..config import Config
from ..models.compiled import CompiledSystem
from ..solver import solve_lm


class FleetSolver:
    """Solve B same-topology sketches sharded across a device mesh.

    B must be divisible by the mesh size (pad the fleet if needed).

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
    ):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("batch",))
        self.mesh = mesh
        self.system = system
        self.config = config
        self.batch_params = batch_params
        max_iterations = config.max_iterations

        batch_sharding = NamedSharding(mesh, P("batch"))
        scalar_sharding = NamedSharding(mesh, P())

        # Small topologies evaluate via the unrolled (static-index) path,
        # matching BatchSolver bit for bit.
        ev = _maybe_unroll(system)
        fast_sat = system.all_weights_positive()

        def _sat(res, pars):
            if fast_sat:
                return system.satisfaction_from_residual(res.residual)
            return system.constraint_satisfaction(res.x, pars)

        if batch_params:
            def one(x0, pars, rtol, stol, lam0):
                res = solve_lm(ev, x0, max_iterations, rtol, stol, lam0, pars=pars)
                return res, _sat(res, pars)

            vm = jax.vmap(one, in_axes=(0, 0, None, None, None))
            n_blocks = len(system.blocks)
            self._run = jax.jit(
                vm,
                in_shardings=(
                    batch_sharding,
                    tuple(batch_sharding for _ in range(n_blocks)),
                    scalar_sharding,
                    scalar_sharding,
                    scalar_sharding,
                ),
            )
        else:
            def one(x0, rtol, stol, lam0):
                res = solve_lm(ev, x0, max_iterations, rtol, stol, lam0)
                return res, _sat(res, None)

            vm = jax.vmap(one, in_axes=(0, None, None, None))
            self._run = jax.jit(
                vm,
                in_shardings=(
                    batch_sharding,
                    scalar_sharding,
                    scalar_sharding,
                    scalar_sharding,
                ),
            )

    def solve(self, x0: jnp.ndarray, pars: Optional[Tuple] = None) -> BatchResult:
        c = self.config
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
