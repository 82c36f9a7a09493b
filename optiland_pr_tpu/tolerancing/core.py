"""Tolerancing core: perturbations, compensators, operand evaluation.

Rebuild of optiland/tolerancing/ (core.py, perturbation.py:19-200,
compensator.py:15-80). Key TPU-native difference: a perturbed system is just a
modified parameter pytree, so a Monte-Carlo batch is a *stacked* pytree that
``vmap`` pushes through the compiled trace — thousands of perturbed systems
trace in one XLA launch (SURVEY.md §2.9, §5.7) instead of the reference's
serial Python loop (tolerancing/monte_carlo.py:60-123).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..optimize.operands import operand_registry
from ..optimize.variables import Variable, make_variable

__all__ = ["ScalarSampler", "RangeSampler", "DistributionSampler",
           "Perturbation", "Compensator", "Tolerancing"]


class ScalarSampler:
    """Fixed sequence of scalar values (reference perturbation.py ScalarSampler)."""

    def __init__(self, values):
        self.values = jnp.atleast_1d(jnp.asarray(values))
        self.size = self.values.shape[0]

    def sample(self, key, n):
        idx = jax.random.randint(key, (n,), 0, self.size)
        return self.values[idx]

    def sweep(self):
        return self.values


class RangeSampler:
    """Uniform over [start, end] (reference RangeSampler)."""

    def __init__(self, start, end, steps: int = 5):
        self.start = start
        self.end = end
        self.steps = steps

    def sample(self, key, n):
        return jax.random.uniform(key, (n,), minval=self.start,
                                  maxval=self.end)

    def sweep(self):
        return jnp.linspace(self.start, self.end, self.steps)


class DistributionSampler:
    """Normal (or custom) distribution (reference DistributionSampler)."""

    def __init__(self, kind: str = "normal", loc: float = 0.0,
                 scale: float = 1.0, steps: int = 5):
        self.kind = kind
        self.loc = loc
        self.scale = scale
        self.steps = steps

    def sample(self, key, n):
        if self.kind == "normal":
            return self.loc + self.scale * jax.random.normal(key, (n,))
        if self.kind == "uniform":
            return jax.random.uniform(key, (n,), minval=self.loc - self.scale,
                                      maxval=self.loc + self.scale)
        raise ValueError(self.kind)

    def sweep(self):
        if self.kind == "normal":
            return self.loc + self.scale * jnp.linspace(-2, 2, self.steps)
        return jnp.linspace(self.loc - self.scale, self.loc + self.scale,
                            self.steps)


@dataclasses.dataclass
class Perturbation:
    variable: Variable
    sampler: Any
    nominal: Any = None

    def apply(self, params, value):
        return self.variable.set(params, value)


@dataclasses.dataclass
class Compensator:
    """A variable adjusted after perturbation to re-optimize the system
    (reference tolerancing/compensator.py: wraps an OptimizationProblem)."""
    variable: Variable


class Tolerancing:
    """Perturbation/compensation/evaluation container (reference
    tolerancing/core.py)."""

    def __init__(self, optic, method: str = "generic", tol: float = 1e-6):
        self.optic = optic
        self.model, self.nominal_params = optic.build()
        self.perturbations: list[Perturbation] = []
        self.compensators: list[Compensator] = []
        self.operands: list[tuple[str, dict, float]] = []
        self.method = method
        self.tol = tol

    # -- construction (reference-style API) --------------------------------
    def add_perturbation(self, variable_type: str, sampler,
                         surface_number=None, **kw):
        v = make_variable(self.model, variable_type,
                          surface_number=surface_number, **kw)
        nominal = v.get(self.nominal_params)
        self.perturbations.append(Perturbation(v, sampler, nominal))
        return self.perturbations[-1]

    def add_compensator(self, variable_type: str, surface_number=None, **kw):
        v = make_variable(self.model, variable_type,
                          surface_number=surface_number, **kw)
        self.compensators.append(Compensator(v))
        return self.compensators[-1]

    def add_operand(self, operand_type: str, input_data=None, target=None):
        input_data = dict(input_data or {})
        if target is None:
            # reference semantics (tolerancing/core.py add_operand): a
            # target-less operand targets its NOMINAL value — compensators
            # restore the unperturbed metric, they don't drive it to zero
            fn = operand_registry[operand_type]
            target = float(fn(self.model, self.nominal_params, **input_data))
        self.operands.append((operand_type, input_data, target))

    # -- pure evaluation pipeline ------------------------------------------
    def _apply_perturbations(self, params, values):
        for pert, v in zip(self.perturbations, values):
            params = pert.apply(params, v)
        return params

    def _compensate(self, params, n_steps: int = 30, lr: float = 0.05,
                    n_newton: int = 4):
        """Fixed-iteration inner optimization over compensator variables —
        vmap-friendly (static step counts): Adam warmup to the basin, then
        damped-Newton polish (the refocus/realign problems compensators
        solve are near-quadratic, so a handful of Newton steps converges to
        optimizer precision — matching the reference's scipy-convergence
        compensator, tolerancing/compensator.py:15-80, to ~1e-8).

        The loss is the sum of squared operand deltas against targets.
        """
        if not self.compensators:
            return params
        comp_vars = [c.variable for c in self.compensators]

        def resid_fn(x, base_params):
            p = base_params
            for var, xi in zip(comp_vars, x):
                p = var.set(p, xi)
            rs = []
            for op_type, input_data, target in self.operands:
                fn = operand_registry[op_type]
                v = fn(self.model, p, **input_data)
                t = 0.0 if target is None else target
                rs.append(jnp.reshape(v - t, ()))
            return jnp.stack(rs)

        def loss_fn(x, base_params):
            return jnp.sum(resid_fn(x, base_params) ** 2)

        x = jnp.stack([jnp.reshape(v.get(params), ()) for v in comp_vars])
        grad_fn = jax.grad(loss_fn)

        # Adam steps with fixed count (jit/vmap-safe)
        m = jnp.zeros_like(x)
        s = jnp.zeros_like(x)
        b1, b2, eps = 0.9, 0.999, 1e-8

        def body(i, carry):
            x, m, s = carry
            g = grad_fn(x, params)
            m = b1 * m + (1 - b1) * g
            s = b2 * s + (1 - b2) * g**2
            mh = m / (1 - b1 ** (i + 1.0))
            sh = s / (1 - b2 ** (i + 1.0))
            x = x - lr * mh / (jnp.sqrt(sh) + eps)
            return x, m, s

        x, _, _ = jax.lax.fori_loop(0, n_steps, body, (x, m, s))

        # Damped Gauss-Newton polish on the residual vector: the GN step is
        # always a DESCENT direction of the squared loss, so it cannot lock
        # onto the v' = 0 stationary point (a local max of (v-t)^2 between
        # the two v = t roots) the way a plain Newton-on-the-loss does.
        # jacrev, not jacfwd: operands may route through the custom_vjp
        # Pallas kernel (trace/engine.py), which has no JVP rule; the
        # compensator count is tiny so reverse-mode is as cheap.
        jac_fn = jax.jacrev(resid_fn)

        def gn_body(i, x):
            r = resid_fn(x, params)
            J = jac_fn(x, params)
            JTJ = J.T @ J + 1e-12 * jnp.eye(x.shape[0], dtype=x.dtype)
            step = jnp.linalg.solve(JTJ, J.T @ r)
            loss0 = jnp.sum(r ** 2)
            x_full = x - step
            x_half = x - 0.5 * step
            l_full = loss_fn(x_full, params)
            l_half = loss_fn(x_half, params)
            # accept the best finite candidate that does not increase loss
            cand_x = jnp.where(l_full <= l_half, x_full, x_half)
            cand_l = jnp.minimum(l_full, l_half)
            ok = jnp.isfinite(cand_l) & jnp.all(jnp.isfinite(cand_x)) \
                & (cand_l <= loss0)
            return jnp.where(ok, cand_x, x)

        # polish from BOTH the Adam iterate and the nominal start (if Adam
        # parked at v' = 0 the Jacobian vanishes and GN cannot move), and
        # keep the better
        x0 = jnp.stack([jnp.reshape(v.get(params), ()) for v in comp_vars])
        xa = jax.lax.fori_loop(0, n_newton, gn_body, x)
        xb = jax.lax.fori_loop(0, n_newton, gn_body, x0)
        x = jnp.where(loss_fn(xa, params) <= loss_fn(xb, params), xa, xb)
        for var, xi in zip(comp_vars, x):
            params = var.set(params, xi)
        return params

    def _evaluate(self, params):
        vals = []
        for op_type, input_data, target in self.operands:
            fn = operand_registry[op_type]
            vals.append(jnp.reshape(fn(self.model, params, **input_data), ()))
        return jnp.stack(vals) if vals else jnp.zeros((0,))

    def evaluate_single(self, values, compensate: bool = True,
                        comp_steps: int = 30):
        """Perturb -> compensate -> evaluate for one perturbation vector."""
        p = self._apply_perturbations(self.nominal_params, values)
        if compensate:
            p = self._compensate(p, n_steps=comp_steps)
        return self._evaluate(p)

    def reset(self):
        """No-op for API parity: the nominal params are never mutated."""
