"""Pupil apodization functions (reference optiland/apodization/, 478 LoC):
Uniform, Gaussian, CosineSquared, Hann, Tukey, SuperGaussian, Polynomial.

Each is a callable ``(Px, Py) -> intensity`` over normalized pupil coordinates;
passed to the trace via Optic.set_apodization / the trace's ``apodization``
argument (reference rays/ray_generator.py:93-97).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["UniformApodization", "GaussianApodization",
           "CosineSquaredApodization", "HannApodization", "TukeyApodization",
           "SuperGaussianApodization", "PolynomialApodization"]


class BaseApodization:
    def __call__(self, Px, Py):
        return self.get_intensity(Px, Py)

    def get_intensity(self, Px, Py):
        raise NotImplementedError


class UniformApodization(BaseApodization):
    def get_intensity(self, Px, Py):
        return jnp.ones_like(Px)


class GaussianApodization(BaseApodization):
    def __init__(self, sigma: float = 1.0):
        self.sigma = sigma

    def get_intensity(self, Px, Py):
        return jnp.exp(-(Px**2 + Py**2) / (2 * self.sigma**2))


class CosineSquaredApodization(BaseApodization):
    def __init__(self, R: float = 1.0):
        self.R = R

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        intensity = jnp.cos(jnp.pi * r / (2 * self.R)) ** 2
        return jnp.where(r < self.R, intensity, 0.0)


class HannApodization(BaseApodization):
    def __init__(self, D: float = 2.0):
        self.D = D

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        intensity = 0.5 * (1 - jnp.cos(2 * jnp.pi * r / self.D))
        return jnp.where(r < self.D / 2, intensity, 0.0)


class TukeyApodization(BaseApodization):
    def __init__(self, R: float = 1.0, alpha: float = 0.5):
        self.R = R
        self.alpha = alpha

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        flat_end = self.R * (1 - self.alpha / 2)
        cos_arg = jnp.pi * (r - flat_end) / (self.R * self.alpha / 2)
        taper = 0.5 * (1 + jnp.cos(cos_arg))
        out = jnp.where(r <= flat_end, 1.0, taper)
        return jnp.where(r <= self.R, out, 0.0)


class SuperGaussianApodization(BaseApodization):
    def __init__(self, w: float = 1.0, n: float = 4.0):
        self.w = w
        self.n = n

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        return jnp.exp(-((r / self.w) ** self.n))


class PolynomialApodization(BaseApodization):
    def __init__(self, R: float = 1.0, p: float = 1.0):
        self.R = R
        self.p = p

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        intensity = (1 - (r / self.R) ** 2) ** self.p
        return jnp.where(r < self.R, intensity, 0.0)
