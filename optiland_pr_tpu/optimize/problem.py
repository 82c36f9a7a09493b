"""Merit-function definition and the jitted loss/grad pipeline.

Rebuild of the reference OptimizationProblem (optiland/optimization/problem.py:26-170):
operands are weighted deltas (equality targets or inequality bounds), the merit
is sum of squared weighted deltas. Unlike the reference — which mutates the
optic and re-evaluates eagerly per step — the merit here is one pure jitted
function of the scaled variable vector, with exact gradients from jax.grad
(reference's torch path: optimization/optimizer/torch/base.py:95-154).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .operands import operand_registry
from .variables import VariableList, make_variable

__all__ = ["Operand", "OptimizationProblem"]


@dataclasses.dataclass
class Operand:
    """(reference operand.py:155-239). Equality target or min/max bounds."""
    operand_type: str
    target: float | None = None
    min_val: float | None = None
    max_val: float | None = None
    weight: float = 1.0
    input_data: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if (self.min_val is not None and self.max_val is not None
                and self.min_val > self.max_val):
            raise ValueError(f"{self.operand_type}: min_val > max_val")
        if self.target is not None and (self.min_val is not None
                                        or self.max_val is not None):
            raise ValueError(f"{self.operand_type}: cannot mix equality and "
                             "inequality targets")

    def value(self, model, params):
        fn = operand_registry.get(self.operand_type)
        if fn is None:
            raise ValueError(f"Unknown operand type: {self.operand_type}")
        return fn(model, params, **self.input_data)

    def delta(self, model, params):
        v = self.value(model, params)
        if self.target is not None:
            return v - self.target
        lower = jnp.maximum(0.0, self.min_val - v) \
            if self.min_val is not None else 0.0
        upper = jnp.maximum(0.0, v - self.max_val) \
            if self.max_val is not None else 0.0
        return lower + upper

    def fun(self, model, params):
        return self.weight * self.delta(model, params)


class OptimizationProblem:
    """Operand + variable container with a compiled merit function.

    Usage::

        problem = OptimizationProblem(optic)
        problem.add_operand("f2", target=50.0, weight=1.0)
        problem.add_operand("rms_spot_size", target=0.0, weight=10,
                            input_data={"surface_number": -1, "Hx": 0, "Hy": 0,
                                        "num_rays": 5, "wavelength": 0.55})
        problem.add_variable("radius", surface_number=1)
        ...
        result = OptimizerGeneric(problem).optimize()
    """

    def __init__(self, optic):
        self.optic = optic
        self.model, self.params = optic.build()
        self.operands: list[Operand] = []
        self.variables = VariableList()
        self._merit_jit = None
        self._value_and_grad_jit = None
        self.initial_value = 0.0

    # -- construction ------------------------------------------------------
    def add_operand(self, operand_type=None, target=None, min_val=None,
                    max_val=None, weight=1.0, input_data=None):
        input_data = dict(input_data or {})
        input_data.pop("optic", None)   # reference-API compatibility
        op = Operand(operand_type, target, min_val, max_val, weight,
                     input_data)
        if op.target is None and op.min_val is None and op.max_val is None:
            op.target = float(op.value(self.model, self.params))
        self.operands.append(op)
        self._invalidate()

    def add_variable(self, variable_type, surface_number=None, scaler=None,
                     min_val=None, max_val=None, **kw):
        # tolerate reference-style add_variable(optic, type, ...) call shape
        if not isinstance(variable_type, str):
            variable_type, surface_number = surface_number, kw.pop(
                "surface_number", None)
        v = make_variable(self.model, variable_type,
                          surface_number=surface_number, scaler=scaler,
                          min_val=min_val, max_val=max_val, **kw)
        self.variables.append(v)
        self._invalidate()

    def clear_operands(self):
        self.operands = []
        self._invalidate()

    def clear_variables(self):
        self.variables = VariableList()
        self._invalidate()

    def _invalidate(self):
        self._merit_jit = None
        self._value_and_grad_jit = None

    def rebuild(self):
        """Re-derive (model, params) from the Optic after a structural edit
        (e.g. a categorical material swap) and drop compiled merit caches."""
        self.model, self.params = self.optic.build()
        self._invalidate()

    # -- merit function ----------------------------------------------------
    def fun_array(self, params=None):
        params = self.params if params is None else params
        if not self.operands:
            return jnp.array([0.0])
        return jnp.stack([op.fun(self.model, params)
                          for op in self.operands]) ** 2

    def sum_squared(self, params=None):
        return jnp.sum(self.fun_array(params))

    def rss(self, params=None):
        return jnp.sqrt(self.sum_squared(params))

    def merit_of_vector(self, x):
        """Merit as a pure function of the scaled variable vector. Pickups and
        solves re-resolve inside the merit (reference problem.update_optics ->
        optic.update), so their effect is differentiable."""
        params = self.variables.apply(self.params, x)
        if getattr(self.optic, "constraints", None):
            from ..system.constraints import apply_constraints
            params = apply_constraints(self.model, params,
                                       self.optic.constraints)
        return self.sum_squared(params)

    @property
    def merit_jit(self):
        if self._merit_jit is None:
            self._merit_jit = jax.jit(self.merit_of_vector)
        return self._merit_jit

    @property
    def value_and_grad(self):
        if self._value_and_grad_jit is None:
            self._value_and_grad_jit = jax.jit(
                jax.value_and_grad(self.merit_of_vector))
        return self._value_and_grad_jit

    # -- state sync --------------------------------------------------------
    def x0(self):
        return self.variables.to_vector(self.params)

    def accept(self, x):
        """Write optimized variable values back into the problem params and
        the owning Optic builder cache."""
        self.params = self.variables.apply(self.params, x)
        self.optic._cache = (self.model, self.params)
        self.optic._jit_cache = {}
        return self.params

    # -- info --------------------------------------------------------------
    def operand_info(self):
        rows = []
        for op in self.operands:
            rows.append({
                "type": op.operand_type,
                "target": op.target,
                "min": op.min_val,
                "max": op.max_val,
                "weight": op.weight,
                "value": float(op.value(self.model, self.params)),
                "delta": float(op.delta(self.model, self.params)),
            })
        return rows

    def variable_info(self):
        return [{"name": v.name, "value": float(v.get(self.params)),
                 "min": v.min_val, "max": v.max_val}
                for v in self.variables]

    def info(self):
        import pprint
        pprint.pprint(self.operand_info())
        pprint.pprint(self.variable_info())
