"""Connected-component decomposition of a constraint system.

Big sketches are usually unions of small independent subsystems — the
reference's 2000-var ``massive_parallel_system`` is 500 independent 4-var
blocks concatenated into one sparse matrix and solved serially on one core
(``gen_big_problem.py:16-27``, ``README.md:37-41``). The TPU-native answer is
to *find* that block structure: decompose the constraint graph into connected
components, bucket components by identical topology, and solve each bucket as
one vmapped batch with per-component parameters. A 2000-var block-diagonal
system becomes a (500, 4)-batched dense solve that lives entirely in
registers/VMEM.

Semantics: each component runs its own LM loop (per-component lambda and
convergence). Final values match a global solve wherever both converge
(residual < 1e-8); the reported ``iterations`` is the max over components.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from ..constraints import Constraint, ConstraintRequest, KernelInstance
from .compiled import CompiledSystem, compile_system


@dataclass
class Component:
    """One connected component: constraint indices + its variable ids."""

    constraint_ids: List[int]
    var_ids: List[int]  # global ids, sorted
    local_of_global: Dict[int, int]


def connected_components(
    constraints: Sequence[Constraint], n_vars: int
) -> List[Component]:
    """Union-find over the variable-sharing graph.

    Delegates the find/union sweep to the native C++ extension
    (``native/fastdecomp.cpp``) when available — the host-side bottleneck
    for million-constraint systems — with an identical-result Python
    fallback."""
    deps: List[List[int]] = [c.dependent_variable_ids() for c in constraints]

    roots = _component_roots_native(deps, n_vars)
    if roots is None:
        roots = _component_roots_python(deps, n_vars)
    var_root, cons_root = roots

    groups: Dict[int, Component] = {}
    for cid, root in enumerate(cons_root):
        if root < 0:
            root = -1  # constraints with no variables group together
        comp = groups.get(root)
        if comp is None:
            comp = Component(constraint_ids=[], var_ids=[], local_of_global={})
            groups[root] = comp
        comp.constraint_ids.append(cid)

    # Attach variables (including any participating only via shared roots).
    root_vars: Dict[int, set] = defaultdict(set)
    for vid in range(n_vars):
        r = var_root[vid]
        if r >= 0:
            root_vars[r].add(vid)
    for root, comp in groups.items():
        comp.var_ids = sorted(root_vars.get(root, ()))
        comp.local_of_global = {g: i for i, g in enumerate(comp.var_ids)}

    # Deterministic order: by first constraint id.
    return sorted(groups.values(), key=lambda c: c.constraint_ids[0])


def _component_roots_python(deps, n_vars):
    """(var_root, cons_root) — Python union-find (fallback)."""
    parent = list(range(n_vars))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    seen = [False] * n_vars
    for ids in deps:
        for vid in ids:
            seen[vid] = True
        for other in ids[1:]:
            ra, rb = find(ids[0]), find(other)
            if ra != rb:
                parent[rb] = ra
    var_root = [find(v) if seen[v] else -1 for v in range(n_vars)]
    cons_root = [find(ids[0]) if ids else -1 for ids in deps]
    return var_root, cons_root


def _component_roots_native(deps, n_vars):
    """(var_root, cons_root) via the C++ extension, or None."""
    from ..native import load_fastdecomp

    mod = load_fastdecomp()
    if mod is None:
        return None
    offsets = np.zeros(len(deps) + 1, dtype=np.int32)
    for i, ids in enumerate(deps):
        offsets[i + 1] = offsets[i] + len(ids)
    flat = np.fromiter(
        (v for ids in deps for v in ids), dtype=np.int32, count=int(offsets[-1])
    )
    vr_bytes, cr_bytes = mod.components(n_vars, offsets, flat)
    var_root = np.frombuffer(vr_bytes, dtype=np.int32)
    cons_root = np.frombuffer(cr_bytes, dtype=np.int32)
    return var_root.tolist(), cons_root.tolist()


def _component_signature(
    comp: Component, constraints: Sequence[Constraint], weights: Sequence[float]
) -> tuple:
    """Topology signature: lowered kernel sequences with local variable ids,
    weights included, parameters excluded (they batch)."""
    items = []
    for cid in comp.constraint_ids:
        for inst in constraints[cid].lower():
            local = tuple(comp.local_of_global[v] for v in inst.var_ids)
            items.append((inst.kernel, local, weights[cid]))
    return tuple(items)


@dataclass
class Bucket:
    """Components sharing one topology, solvable as a single batch."""

    system: CompiledSystem  # compiled with local ids for the template
    components: List[Component]
    pars: Tuple[np.ndarray, ...]  # per-block (B, n_k, np_k)
    var_index: np.ndarray  # (B, n_local) gather/scatter map to global x
    cid_index: np.ndarray  # (B, n_local_constraints) map to global cids


def build_buckets(
    constraints: Sequence[Constraint],
    n_vars: int,
    weights: Optional[Sequence[float]] = None,
    dtype=None,
) -> List[Bucket]:
    import jax.numpy as jnp

    if weights is None:
        weights = [1.0] * len(constraints)
    if dtype is None:
        dtype = jnp.float64
    comps = connected_components(constraints, n_vars)
    by_sig: Dict[tuple, List[Component]] = defaultdict(list)
    for comp in comps:
        by_sig[_component_signature(comp, constraints, weights)].append(comp)

    buckets: List[Bucket] = []
    for sig in sorted(by_sig.keys(), key=lambda s: str(s)):
        group = by_sig[sig]
        template = group[0]

        # Compile the template component with local variable ids. Remapping
        # happens on the *lowered* instances: only the ids a kernel actually
        # gathers (e.g. Vertical touches just the two x ids even though its
        # datum line also names y ids that may belong to other components).
        local_constraints = []
        local_weights = []
        for cid in template.constraint_ids:
            insts = tuple(
                KernelInstance(
                    inst.kernel,
                    tuple(template.local_of_global[v] for v in inst.var_ids),
                    inst.params,
                )
                for inst in constraints[cid].lower()
            )
            local_constraints.append(_Lowered(insts))
            local_weights.append(weights[cid])
        system = compile_system(
            local_constraints, n_vars=len(template.var_ids),
            weights=local_weights, dtype=dtype,
        )

        # Batched parameters: every component's lowered params, stacked in
        # the template's block order. Components share the signature so the
        # lowering order matches exactly.
        pars_per_comp = []
        for comp in group:
            by_kind: Dict[str, List[tuple]] = defaultdict(list)
            for cid in comp.constraint_ids:
                for inst in constraints[cid].lower():
                    by_kind[inst.kernel].append(inst.params)
            pars_per_comp.append(by_kind)
        pars = []
        for b in system.blocks:
            stacked = np.stack(
                [
                    np.asarray(pc[b.spec.name], dtype=np.float64).reshape(
                        len(pc[b.spec.name]), b.spec.nparams
                    )
                    for pc in pars_per_comp
                ]
            )
            pars.append(stacked)

        var_index = np.stack([np.asarray(c.var_ids, dtype=np.int32) for c in group])
        cid_index = np.stack(
            [np.asarray(c.constraint_ids, dtype=np.int32) for c in group]
        )
        buckets.append(
            Bucket(
                system=system,
                components=group,
                pars=tuple(pars),
                var_index=var_index,
                cid_index=cid_index,
            )
        )
    return buckets


class _Lowered:
    """Pre-lowered constraint: satisfies the ``.lower()`` protocol that
    ``compile_system`` consumes."""

    __slots__ = ("instances",)

    def __init__(self, instances):
        self.instances = instances

    def lower(self):
        return list(self.instances)


@dataclass
class BlockSolveResult:
    x: np.ndarray  # (n_vars,) final values
    iterations: int  # max over components (reference reports one number)
    converged: bool  # all components converged
    satisfied: np.ndarray  # (n_constraints,) bool
    degenerate: np.ndarray  # (n_constraints,) bool
    n_components: int
    n_buckets: int


class BlockSolver:
    """Reusable decomposed solver: buckets, batched parameters, and jitted
    per-bucket solvers are built once; ``solve(x0)`` just dispatches."""

    def __init__(
        self,
        constraints: Sequence[Constraint],
        n_vars: int,
        weights: Optional[Sequence[float]] = None,
        config: Config = Config(),
        precision: str = "f64",
        pallas_coarse: bool = False,
    ):
        """``precision``/``pallas_coarse`` select the fleet fast paths (see
        ``BatchSolver``): "mixed" for f32+f64-refinement throughput on TPU,
        plus the Pallas VMEM-resident coarse kernel when the component
        batches tile. The default stays reference-exact f64."""
        import jax.numpy as jnp

        from ..batch import BatchSolver

        self.n_vars = n_vars
        self.n_constraints = len(constraints)
        self.config = config
        self.buckets = build_buckets(constraints, n_vars, weights)
        self.n_components = sum(len(b.components) for b in self.buckets)
        self._solvers = [
            BatchSolver(b.system, config, batch_params=True,
                        precision=precision,
                        pallas_coarse=pallas_coarse and precision == "mixed")
            for b in self.buckets
        ]
        self._pars = [tuple(jnp.asarray(p) for p in b.pars) for b in self.buckets]

    def solve(self, x0: np.ndarray) -> BlockSolveResult:
        import jax.numpy as jnp

        x_out = np.array(x0, dtype=np.float64)
        iterations = 0
        converged = True
        satisfied = np.ones(self.n_constraints, dtype=bool)
        degenerate = np.zeros(self.n_constraints, dtype=bool)

        for bucket, solver, pars in zip(self.buckets, self._solvers, self._pars):
            x0_batch = jnp.asarray(x_out[bucket.var_index])
            res = solver.solve(x0_batch, pars)
            xb = np.asarray(res.x)
            flat_vars = bucket.var_index.reshape(-1)
            x_out[flat_vars] = xb.reshape(-1)
            satisfied[bucket.cid_index.reshape(-1)] = np.asarray(res.satisfied).reshape(-1)
            degenerate[bucket.cid_index.reshape(-1)] = np.asarray(res.degenerate).reshape(-1)
            iterations = max(iterations, int(np.max(np.asarray(res.iterations))))
            converged = converged and bool(np.all(np.asarray(res.converged)))

        return BlockSolveResult(
            x=x_out,
            iterations=iterations,
            converged=converged,
            satisfied=satisfied,
            degenerate=degenerate,
            n_components=self.n_components,
            n_buckets=len(self.buckets),
        )


def solve_blocks(
    constraints: Sequence[Constraint],
    x0: np.ndarray,
    weights: Optional[Sequence[float]] = None,
    config: Config = Config(),
) -> BlockSolveResult:
    """One-shot convenience wrapper around ``BlockSolver``."""
    return BlockSolver(constraints, len(x0), weights, config).solve(x0)
