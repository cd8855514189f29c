"""Classical numerics: JAX-native ground-truth oracles (SURVEY.md §2.4)."""

from dnnpde_tpu.numerics.binomial import crr_binomial
from dnnpde_tpu.numerics.black_scholes import (
    basket_analytical_approx,
    black_scholes_call,
    black_scholes_delta,
    geometric_asian_call,
    lookback_call_floating,
    bsb_exact_solution,
    call_price_grid,
)
from dnnpde_tpu.numerics.crank_nicolson import (
    CNGrid,
    bilinear_interpolate,
    cn_delta_gamma,
    crank_nicolson_heston,
)
from dnnpde_tpu.numerics.calibration import (
    CalibrationResult,
    calibrate_heston,
)
from dnnpde_tpu.numerics.implied_vol import bs_vega, implied_vol
from dnnpde_tpu.numerics.discrete_bsde import (
    discrete_bsde_surface,
    DiscreteBSDEValue,
    discrete_bsde_value,
    probe_linear_driver,
)
from dnnpde_tpu.numerics.fft_pricer import (
    basket_lognormal_cf_params,
    carr_madan_call,
    fft_basket_call,
)
from dnnpde_tpu.numerics.heston import (
    HestonParams,
    heston_call_price,
    heston_delta_surface,
    heston_gamma_surface,
    heston_mc_price,
    heston_mc_price_ii,
    heston_price_surface,
)
from dnnpde_tpu.numerics.moments import (
    basket_moments,
    match_lognormal,
    moment_matched_basket_call,
)
from dnnpde_tpu.numerics.monte_carlo import (
    basket_call_mc,
    basket_delta_mc,
    basket_price_paths_mc,
    hjb_exact_mc,
)
from dnnpde_tpu.numerics.qmc import (
    QMCValue,
    brownian_bridge_order,
    discrete_bsde_value_qmc,
    sobol_brownian_increments,
)
from dnnpde_tpu.numerics.quadrature import gauss_legendre
from dnnpde_tpu.numerics.longstaff_schwartz import (
    LSMCValue,
    basis_size,
    lsmc_value,
)
from dnnpde_tpu.numerics.variance_gamma import (
    VGParams,
    vg_basket_call,
    vg_table_2,
    vg_table_3,
)

__all__ = [
    "black_scholes_call",
    "black_scholes_delta",
    "geometric_asian_call",
    "lookback_call_floating",
    "call_price_grid",
    "crr_binomial",
    "LSMCValue",
    "basis_size",
    "lsmc_value",
    "basket_analytical_approx",
    "bsb_exact_solution",
    "CNGrid",
    "crank_nicolson_heston",
    "bilinear_interpolate",
    "cn_delta_gamma",
    "HestonParams",
    "heston_call_price",
    "heston_price_surface",
    "heston_delta_surface",
    "heston_gamma_surface",
    "heston_mc_price",
    "heston_mc_price_ii",
    "CalibrationResult",
    "calibrate_heston",
    "bs_vega",
    "implied_vol",
    "DiscreteBSDEValue",
    "discrete_bsde_surface",
    "discrete_bsde_value",
    "probe_linear_driver",
    "QMCValue",
    "brownian_bridge_order",
    "discrete_bsde_value_qmc",
    "sobol_brownian_increments",
    "basket_call_mc",
    "basket_delta_mc",
    "basket_price_paths_mc",
    "hjb_exact_mc",
    "basket_lognormal_cf_params",
    "carr_madan_call",
    "fft_basket_call",
    "basket_moments",
    "match_lognormal",
    "moment_matched_basket_call",
    "gauss_legendre",
    "VGParams",
    "vg_basket_call",
    "vg_table_2",
    "vg_table_3",
]
