from .problem import OptimizationProblem, Operand
from .variables import Variable, VariableList, make_variable
from .operands import METRIC_DICT, operand_registry, register_operand
from .optimizers import (OptimizerGeneric, LeastSquares, DualAnnealing,
                         DifferentialEvolution, BasinHopping, SHGO,
                         OptaxOptimizer, OptimizerAdam, OptimizerSGD,
                         OptimizationResult)
from .scaling import (IdentityScaler, LinearScaler, LogScaler, PowScaler,
                      ReciprocalScaler, get_scaler)
from .glass_expert import GlassExpert
from .ml import OpticalSystemModule, make_loss_fn

__all__ = ["OptimizationProblem", "Operand", "Variable", "VariableList",
           "make_variable", "METRIC_DICT", "operand_registry",
           "register_operand", "OptimizerGeneric", "LeastSquares",
           "DualAnnealing", "DifferentialEvolution", "BasinHopping", "SHGO",
           "OptaxOptimizer", "OptimizerAdam", "OptimizerSGD",
           "OptimizationResult", "IdentityScaler", "LinearScaler", "LogScaler",
           "PowScaler", "ReciprocalScaler", "get_scaler", "GlassExpert",
           "OpticalSystemModule", "make_loss_fn"]
