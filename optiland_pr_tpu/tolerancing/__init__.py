from .core import (ScalarSampler, RangeSampler, DistributionSampler,
                   Perturbation, Compensator, Tolerancing)
from .monte_carlo import MonteCarlo, SensitivityAnalysis

__all__ = ["ScalarSampler", "RangeSampler", "DistributionSampler",
           "Perturbation", "Compensator", "Tolerancing", "MonteCarlo",
           "SensitivityAnalysis"]
