"""Environmental air refractive-index models.

Reference: optiland/environment/ (930 LoC): EnvironmentalConditions plus the
Ciddor (1996), Edlen (1966, NIST-modified), Birch & Downs (1994) and
Kohlrausch dry-air models. All pure jnp, differentiable in (T, P, RH, CO2).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["EnvironmentalConditions", "ciddor_refractive_index",
           "edlen_refractive_index", "birch_downs_refractive_index",
           "kohlrausch_refractive_index", "AIR_INDEX_MODELS", "air_index"]


@dataclasses.dataclass(frozen=True)
class EnvironmentalConditions:
    """(reference environment/conditions.py:19)."""
    pressure: float = 101325.0          # Pa
    temperature: float = 15.0           # deg C
    relative_humidity: float = 0.0      # 0..1
    co2_ppm: float = 400.0
    wavelength: float | None = None


# --- Ciddor (1996) --------------------------------------------------------

_R = 8.314510
_M_W = 0.018015
_T_STD_AIR_K = 288.15
_P_STD_AIR = 101325.0
_T_STD_VAP_K = 293.15
_P_STD_VAP = 1333.0
_CO2_STD = 450.0
_CO2_MOLAR = 400.0
_K0, _K1, _K2, _K3 = 238.0185, 5792105.0, 57.362, 167917.0
_CO2_CORR = 0.534e-6
_W0, _W1, _W2, _W3 = 295.235, 2.6422, -0.032380, 0.004028
_CF_VAPOR = 1.022
_A_SVP, _B_SVP, _C_SVP, _D_SVP = (1.2378847e-5, -1.9121316e-2, 33.93711047,
                                  -6.3431645e3)
_ALPHA_F, _BETA_F, _GAMMA_F = 1.00062, 3.14e-8, 5.6e-7
_A0_Z, _A1_Z, _A2_Z = 1.58123e-6, -2.9331e-8, 1.1043e-10
_B0_Z, _B1_Z = 5.707e-6, -2.051e-8
_C0_Z, _C1_Z = 1.9898e-4, -2.376e-6
_D_Z, _E_Z = 1.83e-11, -0.765e-8


def _svp_ciddor(t_c):
    t_k = t_c + 273.15
    warm = jnp.exp(_A_SVP * t_k**2 + _B_SVP * t_k + _C_SVP + _D_SVP / t_k)
    cold = 10.0 ** (-2663.5 / t_k + 12.537)
    return jnp.where(jnp.asarray(t_c) >= 0, warm, cold)


def _compressibility(p_pa, t_k, xw):
    t_c = t_k - 273.15
    term1 = _A0_Z + _A1_Z * t_c + _A2_Z * t_c**2
    term2 = (_B0_Z + _B1_Z * t_c) * xw
    term3 = (_C0_Z + _C1_Z * t_c) * xw**2
    term4 = _D_Z + _E_Z * xw**2
    return (1.0 - (p_pa / t_k) * (term1 + term2 + term3)
            + (p_pa / t_k) ** 2 * term4)


def ciddor_refractive_index(wavelength_um, conditions: EnvironmentalConditions):
    """(reference environment/models/ciddor.py:184-280)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_as = 1e-8 * (_K1 / (_K0 - sigma_sq) + _K3 / (_K2 - sigma_sq))
    n_axs = n_as * (1.0 + _CO2_CORR * (conditions.co2_ppm - _CO2_STD))
    n_ws = 1e-8 * _CF_VAPOR * (_W0 + _W1 * sigma_sq + _W2 * sigma_sq**2
                               + _W3 * sigma_sq**3)

    m_a = 1e-3 * (28.9635 + 12.011e-6 * (conditions.co2_ppm - _CO2_MOLAR))
    z_axs = _compressibility(_P_STD_AIR, _T_STD_AIR_K, 0.0)
    rho_axs = (_P_STD_AIR * m_a) / (z_axs * _R * _T_STD_AIR_K)
    rho_ws = (_P_STD_VAP * _M_W) / (
        _compressibility(_P_STD_VAP, _T_STD_VAP_K, 1.0) * _R * _T_STD_VAP_K)

    t_c = conditions.temperature
    p_pa = conditions.pressure
    t_k = t_c + 273.15
    svp = _svp_ciddor(t_c)
    f = _ALPHA_F + _BETA_F * p_pa + _GAMMA_F * t_c**2
    xw = jnp.where(p_pa > 0, f * conditions.relative_humidity * svp / p_pa,
                   0.0)
    z = _compressibility(p_pa, t_k, xw)
    rho_a = (p_pa * m_a * (1.0 - xw)) / (z * _R * t_k)
    rho_w = (p_pa * _M_W * xw) / (z * _R * t_k)

    return 1.0 + (rho_a / rho_axs) * n_axs + (rho_w / rho_ws) * n_ws


# --- Edlen (1966, NIST-modified) ------------------------------------------

def _svp_buck(t_c):
    return 611.21 * jnp.exp((18.678 - t_c / 234.5) * (t_c / (257.14 + t_c)))


def edlen_refractive_index(wavelength_um, conditions: EnvironmentalConditions):
    """(reference environment/models/edlen.py)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_s = 1e-8 * (8342.13 + 2406030.0 / (130.0 - sigma_sq)
                  + 15997.0 / (38.9 - sigma_sq))
    co2_factor = 1.0 + 0.540 * (conditions.co2_ppm - 300.0) * 1e-6
    n_sc = n_s * co2_factor
    torr = 101325.0 / 760.0
    p_torr = conditions.pressure / torr
    t_c = conditions.temperature
    density = (p_torr * (1.0 + p_torr * (0.817 - 0.0133 * t_c) * 1e-6)) / (
        1.0 + 0.0036710 * t_c)
    n_tp = n_sc * (density / 720.775)
    f_torr = conditions.relative_humidity * _svp_buck(t_c) / torr
    wv = -f_torr * (5.722 - 0.0457 * sigma_sq) * 1e-8
    wv = wv * (292.75 / (t_c + 273.15))
    return 1.0 + n_tp + wv


# --- Birch & Downs (1994) -------------------------------------------------

def birch_downs_refractive_index(wavelength_um,
                                 conditions: EnvironmentalConditions):
    """(reference environment/models/birch_downs.py)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_s = 1e-8 * (8342.54 + 2406147.0 / (130.0 - sigma_sq)
                  + 15998.0 / (38.9 - sigma_sq))
    n_as = n_s * (1.0 + 0.534e-6 * (conditions.co2_ppm - 450.0))
    t_c = conditions.temperature
    p_pa = conditions.pressure
    density = (p_pa / 96095.43) * (
        (1 + 1e-8 * (0.601 - 0.00972 * t_c) * p_pa) / (1 + 0.003661 * t_c))
    n_tp = n_as * density
    f_w = 1.00062 + 3.14e-8 * p_pa + 5.6e-7 * t_c**2
    # reference birch_downs svp uses the Ciddor warm-branch formula only
    t_k = t_c + 273.15
    svp = jnp.exp(_A_SVP * t_k**2 + _B_SVP * t_k + _C_SVP + _D_SVP / t_k)
    f_pa = conditions.relative_humidity * svp * f_w
    wv = -f_pa * (3.7345 - 0.0401 * sigma_sq) * 1e-10
    wv = wv * (292.75 / (t_c + 273.15))
    return 1.0 + n_tp + wv


# --- Kohlrausch (dry air) -------------------------------------------------

def kohlrausch_refractive_index(wavelength_um,
                                conditions: EnvironmentalConditions):
    """(reference environment/models/kohlrausch.py)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_ref = 1e-5 * (64.328 + 29498.1 / (146.0 - sigma_sq)
                    + 25.54 / (41.0 - sigma_sq))
    rel_p = conditions.pressure / 101325.0
    denom = 1.0 + (conditions.temperature - 15.0) * 0.00348
    return 1.0 + n_ref * rel_p / denom


AIR_INDEX_MODELS = {
    "ciddor": ciddor_refractive_index,
    "edlen": edlen_refractive_index,
    "birch_downs": birch_downs_refractive_index,
    "kohlrausch": kohlrausch_refractive_index,
}


def air_index(wavelength_um, conditions: EnvironmentalConditions = None,
              model: str = "ciddor"):
    conditions = conditions or EnvironmentalConditions()
    return AIR_INDEX_MODELS[model](wavelength_um, conditions)
