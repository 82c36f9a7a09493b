"""Optimizers: scipy-driven (exact JAX gradients) and optax-driven loops.

Reference equivalents:
- OptimizerGeneric / LeastSquares / DualAnnealing / DifferentialEvolution /
  BasinHopping / SHGO: optiland/optimization/optimizer/scipy/ — there, numpy
  backend with finite-difference or torch gradients; here every scipy call
  gets an exact jitted jax gradient.
- OptimizerAdam / OptimizerSGD: optiland/optimization/optimizer/torch/base.py:95-154
  — here optax, with bound clamping and LR scheduling.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .problem import OptimizationProblem

__all__ = ["OptimizerGeneric", "LeastSquares", "DualAnnealing",
           "DifferentialEvolution", "BasinHopping", "SHGO", "OptaxOptimizer",
           "OptimizerAdam", "OptimizerSGD", "OptimizationResult"]


@dataclasses.dataclass
class OptimizationResult:
    x: np.ndarray
    fun: float
    nit: int = 0
    success: bool = True
    message: str = ""
    history: list = dataclasses.field(default_factory=list)


class OptimizerGeneric:
    """scipy.optimize.minimize wrapper with exact JAX gradients
    (reference optimizer/scipy/base.py:25-120)."""

    method = None  # scipy picks (BFGS / L-BFGS-B with bounds)

    def __init__(self, problem: OptimizationProblem):
        self.problem = problem
        self._x_history = []

    def _fun_and_jac(self):
        vg = self.problem.value_and_grad

        def fun(x):
            v, g = vg(jnp.asarray(x))
            return float(v), np.asarray(g, dtype=np.float64)
        return fun

    def _bounds(self):
        lo, hi = self.problem.variables.bounds()
        if all(b is None for b in lo) and all(b is None for b in hi):
            return None
        # bounds apply in scaled space
        out = []
        for v, l, h in zip(self.problem.variables, lo, hi):
            ls = v.scaler.scale(l) if l is not None else -np.inf
            hs = v.scaler.scale(h) if h is not None else np.inf
            ls, hs = float(ls), float(hs)
            out.append((min(ls, hs), max(ls, hs)))
        return out

    def optimize(self, maxiter: int = 1000, tol: float = 1e-10,
                 disp: bool = False):
        from scipy import optimize as sciopt
        x0 = np.asarray(self.problem.x0(), dtype=np.float64)
        self._x_history.append(x0)
        bounds = self._bounds()
        method = self.method
        if method is None:
            method = "L-BFGS-B" if bounds is not None else "BFGS"
        res = sciopt.minimize(self._fun_and_jac(), x0, jac=True,
                              method=method, bounds=bounds, tol=tol,
                              options={"maxiter": maxiter, "disp": disp})
        self.problem.accept(jnp.asarray(res.x))
        return OptimizationResult(x=res.x, fun=float(res.fun),
                                  nit=getattr(res, "nit", 0),
                                  success=bool(res.success),
                                  message=str(res.message))

    def undo(self):
        """Revert to the previous accepted x (reference scipy/base.py:102)."""
        if self._x_history:
            self.problem.accept(jnp.asarray(self._x_history.pop()))


class LeastSquares(OptimizerGeneric):
    """scipy least_squares on the weighted-delta residual vector with an
    exact JAX Jacobian (reference optimizer/scipy/least_squares.py)."""

    def optimize(self, maxiter: int = 1000, tol: float = 1e-10,
                 disp: bool = False):
        import jax
        from scipy import optimize as sciopt
        problem = self.problem

        def residuals_of_vector(x):
            params = problem.variables.apply(problem.params, x)
            return jnp.stack([op.fun(problem.model, params)
                              for op in problem.operands])

        res_jit = jax.jit(residuals_of_vector)
        # jacrev: operand traces may ride the custom_vjp Pallas kernel,
        # which forward-mode AD (jacfwd) cannot differentiate through
        jac_jit = jax.jit(jax.jacrev(residuals_of_vector))

        x0 = np.asarray(problem.x0(), dtype=np.float64)
        lo, hi = problem.variables.bounds()
        bounds = (np.array([-np.inf if b is None else b for b in lo]),
                  np.array([np.inf if b is None else b for b in hi]))
        res = sciopt.least_squares(
            lambda x: np.asarray(res_jit(jnp.asarray(x))), x0,
            jac=lambda x: np.asarray(jac_jit(jnp.asarray(x))),
            bounds=bounds, max_nfev=maxiter, xtol=tol)
        problem.accept(jnp.asarray(res.x))
        return OptimizationResult(x=res.x, fun=float(res.cost),
                                  success=bool(res.success),
                                  message=str(res.message))


class _GlobalOptimizer(OptimizerGeneric):
    scipy_name = None

    def optimize(self, maxiter: int = 100, disp: bool = False, **kw):
        from scipy import optimize as sciopt
        problem = self.problem
        merit = problem.merit_jit

        def f(x):
            return float(merit(jnp.asarray(x)))

        bounds = self._bounds()
        if bounds is None:
            x0 = np.asarray(problem.x0())
            bounds = [(float(x) - 10.0, float(x) + 10.0) for x in x0]
        fn = getattr(sciopt, self.scipy_name)
        if self.scipy_name == "basinhopping":
            res = fn(f, np.asarray(problem.x0()), niter=maxiter)
        else:
            res = fn(f, bounds=bounds, maxiter=maxiter, **kw) \
                if self.scipy_name != "shgo" else fn(f, bounds=bounds)
        problem.accept(jnp.asarray(res.x))
        return OptimizationResult(x=res.x, fun=float(res.fun),
                                  success=True, message="")


class DualAnnealing(_GlobalOptimizer):
    scipy_name = "dual_annealing"


class DifferentialEvolution(_GlobalOptimizer):
    scipy_name = "differential_evolution"


class BasinHopping(_GlobalOptimizer):
    scipy_name = "basinhopping"


class SHGO(_GlobalOptimizer):
    scipy_name = "shgo"


class OptaxOptimizer:
    """Gradient-descent loop on the jitted merit (reference torch loop:
    optimizer/torch/base.py:95-154): step -> clamp bounds -> schedule."""

    def __init__(self, problem: OptimizationProblem, optimizer=None):
        import optax
        self.problem = problem
        self.optax_opt = optimizer or optax.adam(1e-2)

    def optimize(self, n_steps: int = 100, lr: float | None = None,
                 disp: bool = False, callback=None):
        import jax
        import optax
        problem = self.problem
        opt = self.optax_opt if lr is None else self._make(lr)
        vg = problem.value_and_grad

        lo, hi = problem.variables.bounds()
        lo = jnp.asarray([-jnp.inf if b is None else b for b in lo])
        hi = jnp.asarray([jnp.inf if b is None else b for b in hi])

        @jax.jit
        def step(x, state):
            v, g = vg(x)
            updates, state = opt.update(g, state, x)
            x = optax.apply_updates(x, updates)
            x = jnp.clip(x, lo, hi)
            return x, state, v

        x = problem.x0()
        state = opt.init(x)
        history = []
        for i in range(n_steps):
            x, state, v = step(x, state)
            history.append(float(v))
            if disp and (i % 10 == 0 or i == n_steps - 1):
                print(f"step {i}: loss = {float(v):.6e}")
            if callback:
                callback(i, x, float(v))
        problem.accept(x)
        return OptimizationResult(x=np.asarray(x),
                                  fun=float(problem.merit_jit(x)),
                                  nit=n_steps, history=history)

    def _make(self, lr):
        import optax
        return optax.adam(lr)


class OptimizerAdam(OptaxOptimizer):
    def __init__(self, problem, lr: float = 1e-2):
        import optax
        super().__init__(problem, optax.adam(lr))


class OptimizerSGD(OptaxOptimizer):
    def __init__(self, problem, lr: float = 1e-3, momentum: float = 0.9):
        import optax
        super().__init__(problem, optax.sgd(lr, momentum=momentum))
