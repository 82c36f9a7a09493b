"""Monte-Carlo and sensitivity tolerancing analyses.

Reference: optiland/tolerancing/monte_carlo.py:60-180 (serial loop, pandas) and
sensitivity analysis (tolerancing/sensitivity.py). TPU-native rebuild: all N
trials are one ``vmap`` over stacked perturbation values — perturb +
compensate + evaluate runs as a single compiled batch, shardable across chips
(BASELINE config #5: 10k perturbed systems x 1e5 rays across a pod).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import Tolerancing

__all__ = ["MonteCarlo", "SensitivityAnalysis"]


class MonteCarlo:
    """Batched Monte-Carlo tolerancing."""

    def __init__(self, tolerancing: Tolerancing, seed: int = 0):
        self.tolerancing = tolerancing
        self.seed = seed
        self.results = None
        self._samples = None

    def run(self, num_trials: int, compensate: bool = True,
            comp_steps: int = 30, batch_size: int | None = None):
        """Run N trials. Returns an [N, n_operands] array of operand values
        (also stored as ``.results``)."""
        tol = self.tolerancing
        key = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(key, max(len(tol.perturbations), 1))
        values = [p.sampler.sample(k, num_trials)
                  for p, k in zip(tol.perturbations, keys)]
        samples = jnp.stack(values, axis=1) if values else \
            jnp.zeros((num_trials, 0))
        self._samples = samples

        eval_one = lambda vals: tol.evaluate_single(
            vals, compensate=compensate, comp_steps=comp_steps)
        batched = jax.jit(jax.vmap(eval_one))

        if batch_size is None:
            out = batched(samples)
        else:
            outs = []
            for i in range(0, num_trials, batch_size):
                outs.append(batched(samples[i:i + batch_size]))
            out = jnp.concatenate(outs)
        self.results = out
        return out

    # -- reporting (reference monte_carlo.py:118-180) ----------------------
    def to_dataframe(self):
        import pandas as pd
        tol = self.tolerancing
        cols = {}
        for j, p in enumerate(tol.perturbations):
            cols[f"pert:{p.variable.name}"] = np.asarray(self._samples[:, j])
        for j, (op_type, _, _) in enumerate(tol.operands):
            cols[f"op:{op_type}[{j}]"] = np.asarray(self.results[:, j])
        return pd.DataFrame(cols)

    def summary(self):
        r = np.asarray(self.results)
        return {"mean": r.mean(axis=0), "std": r.std(axis=0),
                "min": r.min(axis=0), "max": r.max(axis=0),
                "p95": np.percentile(r, 95, axis=0)}

    def view_histogram(self, operand_index: int = 0, bins: int = 50):
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.hist(np.asarray(self.results[:, operand_index]), bins=bins)
        ax.set_xlabel(self.tolerancing.operands[operand_index][0])
        ax.set_ylabel("count")
        return fig, ax

    def view_cdf(self, operand_index: int = 0):
        import matplotlib.pyplot as plt
        v = np.sort(np.asarray(self.results[:, operand_index]))
        fig, ax = plt.subplots()
        ax.plot(v, np.linspace(0, 1, v.shape[0]))
        ax.set_xlabel(self.tolerancing.operands[operand_index][0])
        ax.set_ylabel("CDF")
        return fig, ax


class SensitivityAnalysis:
    """Per-perturbation sweep (reference tolerancing/sensitivity.py):
    each perturbation is swept over its sampler's value grid while the others
    stay nominal; operands evaluated (optionally compensated) per point."""

    def __init__(self, tolerancing: Tolerancing):
        self.tolerancing = tolerancing
        self.results = {}

    def run(self, compensate: bool = True, comp_steps: int = 30):
        tol = self.tolerancing
        nominal = jnp.stack(
            [jnp.reshape(jnp.asarray(p.nominal), ())
             for p in tol.perturbations]) if tol.perturbations else \
            jnp.zeros((0,))
        eval_one = jax.jit(jax.vmap(lambda vals: tol.evaluate_single(
            vals, compensate=compensate, comp_steps=comp_steps)))
        for j, p in enumerate(tol.perturbations):
            sweep = p.sampler.sweep()
            vals = jnp.tile(nominal, (sweep.shape[0], 1))
            vals = vals.at[:, j].set(sweep)
            self.results[p.variable.name] = {
                "values": sweep, "operands": eval_one(vals)}
        return self.results

    def view(self, operand_index: int = 0):
        import matplotlib.pyplot as plt
        n = len(self.results)
        fig, axs = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
        for ax, (name, d) in zip(axs[0], self.results.items()):
            ax.plot(np.asarray(d["values"]),
                    np.asarray(d["operands"][:, operand_index]), "o-")
            ax.set_title(name, fontsize=8)
        return fig, axs
