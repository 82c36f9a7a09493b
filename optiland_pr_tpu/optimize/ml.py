"""ML integration: embed the differentiable tracer in training graphs.

Reference: optiland/ml/wrappers.py:32-155 (OpticalSystemModule(nn.Module)
exposing optimization variables as trainable torch parameters). Here the
equivalent is a flax ``nn.Module`` whose parameters are the scaled variable
vector; ``__call__`` returns the merit loss (or any operand stack), so the
optical system can sit inside a larger flax/optax training loop, including
end-to-end with neural networks (deep-optics style).
"""
from __future__ import annotations

import jax.numpy as jnp

from .problem import OptimizationProblem

__all__ = ["OpticalSystemModule", "make_loss_fn"]

try:
    import flax.linen as nn
    _HAVE_FLAX = True
except Exception:  # pragma: no cover
    _HAVE_FLAX = False


def make_loss_fn(problem: OptimizationProblem):
    """Pure (x) -> loss closure over the problem (for any framework)."""
    return problem.merit_of_vector


if _HAVE_FLAX:

    class OpticalSystemModule(nn.Module):
        """Flax module wrapping an OptimizationProblem.

        The module's single parameter vector holds the scaled optimization
        variables, initialized from the current system prescription::

            module = OpticalSystemModule(problem=problem)
            variables = module.init(key)
            loss = module.apply(variables)            # merit loss
            grads = jax.grad(lambda v: module.apply(v))(variables)
        """

        problem: OptimizationProblem

        @nn.compact
        def __call__(self, extra_loss_fn=None):
            x0 = jnp.asarray(self.problem.x0())
            x = self.param("variables", lambda _key: x0)
            loss = self.problem.merit_of_vector(x)
            if extra_loss_fn is not None:
                loss = loss + extra_loss_fn(self.trace_params(x))
            return loss

        def trace_params(self, x):
            """The full parameter pytree for the given variable vector (e.g.
            to run analyses inside the training loop)."""
            params = self.problem.variables.apply(self.problem.params, x)
            if getattr(self.problem.optic, "constraints", None):
                from ..system.constraints import apply_constraints
                params = apply_constraints(self.problem.model, params,
                                           self.problem.optic.constraints)
            return params

else:  # pragma: no cover

    class OpticalSystemModule:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise ImportError("flax is required for OpticalSystemModule")
