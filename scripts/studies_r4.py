"""Round-4 studies: the surface-floor attack (VERDICT r3 #1).

Reproduces the round-3 IV-smile protocol (scripts/studies.py::heston_iv_smile
— surface-trained Heston K=1 model, homogeneity smile, batched IV inversion)
under each round-4 objective variant, and scores every trained surface
against BOTH oracles:

  - the continuum closed form (the round-3 metric), and
  - the exact discrete-N BSDE surface D(N; S0) (numerics.discrete_bsde_surface)
    — separating scheme bias (discrete vs continuum) from optimization /
    approximation error (model vs discrete), per VERDICT r3 #1b.

Variants (VERDICT r3 #1a + #1c):
  global       round-3 default (control row — the measured ~2-3.5 volpt floor)
  local        backward-induction objective (detached same-params targets)
  local_ema    local with frozen EMA-shadow targets
  global_ivw   global + 1/vega² per-path residual weights (IV-space equalized)
  local_ivw    local + the same weights

One JSON line per (variant, metric block). Run on a TPU chip:

    python scripts/studies_r4.py smile_objectives
    python scripts/studies_r4.py smile_winner_bigcfg [objective]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT_DIR = Path(__file__).resolve().parent.parent / "results_r4"

# Round-3 smile protocol constants (scripts/studies.py::heston_iv_smile).
STRIKES = np.linspace(0.75, 1.3, 23)
BUDGET = 20000
PROTO = dict(M=256, N=50, width=256, x0_scale=0.4)


def _emit(**row):
    row.setdefault("semantics", "r4-default")
    print(json.dumps(row), flush=True)


def _train_surface(objective: str, weighted: bool, seed: int = 0,
                   M: int = PROTO["M"], width: int = PROTO["width"],
                   N: int = PROTO["N"], x0_scale: float = PROTO["x0_scale"],
                   budget: int = BUDGET):
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.sim import lognormal_x0
    from dnnpde_tpu.solver import iv_space_weights
    from dnnpde_tpu.train import Trainer

    p = HestonPDE()
    kw = {}
    if weighted:
        kw["path_weight_fn"] = iv_space_weights(
            strike=p.strike, T=p.T, r=p.r
        )
    tr = Trainer(p, M=M, N=N, layers=[3, width, width, width, width, 1],
                 mode="FC", activation="Sine", seed=seed, ema_decay=0.999,
                 x0_sampler=lognormal_x0(p.x0, x0_scale),
                 objective=objective, **kw)
    t0 = time.perf_counter()
    half, quarter = budget // 2, budget // 4
    for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
        tr.train(it, lr, log_every=2000, verbose=False)
    return p, tr, time.perf_counter() - t0


def _model_smile(tr, p):
    """price(1, K) = K · u(0, 1/K, v0) by homogeneity (EMA read)."""
    import jax.numpy as jnp

    S_eval = (1.0 / STRIKES).astype(np.float32)
    X = jnp.stack([jnp.asarray(S_eval),
                   jnp.full_like(jnp.asarray(S_eval), p.v0)], axis=-1)
    u, _ = tr.net_u(tr.ema_params, jnp.zeros((len(STRIKES), 1)), X)
    return STRIKES * np.asarray(u[:, 0])


def _iv(prices, p):
    from dnnpde_tpu.numerics import implied_vol

    return np.asarray(implied_vol(prices, 1.0, STRIKES, p.T, p.r))


def _cf_smile(p):
    from dnnpde_tpu.numerics import HestonParams, heston_call_price

    return np.asarray([
        float(heston_call_price(1.0, p.v0, HestonParams(
            K=float(k), r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
            sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
        for k in STRIKES
    ])


def _discrete_smile(p, N: int, n_paths: int = 4_194_304):
    """Exact discrete-N surface on the smile grid (one compile, K states)."""
    from dnnpde_tpu.numerics import discrete_bsde_surface

    S_eval = (1.0 / STRIKES).astype(np.float32)
    x0s = np.stack([S_eval, np.full_like(S_eval, p.v0)], axis=-1)
    vals = discrete_bsde_surface(p, N=N, x0s=x0s, n_paths=n_paths,
                                 batch=1_048_576, seed=11)
    prices = STRIKES * np.asarray([v.value for v in vals])
    ses = STRIKES * np.asarray([v.standard_error for v in vals])
    return prices, ses


def smile_objectives(seeds=(0,)):
    from dnnpde_tpu.pde import HestonPDE

    p0 = HestonPDE()
    cf_prices = _cf_smile(p0)
    cf_iv = _iv(cf_prices, p0)
    disc_prices, disc_se = _discrete_smile(p0, PROTO["N"])
    disc_iv = _iv(disc_prices, p0)
    scheme_bias = disc_iv - cf_iv
    _emit(study="r4_smile_discrete_oracle", N=PROTO["N"],
          n_paths_per_state=4_194_304,
          max_price_se=round(float(disc_se.max()), 6),
          mean_abs_scheme_bias_volpts=round(
              float(np.mean(np.abs(scheme_bias))) * 100, 3),
          max_abs_scheme_bias_volpts=round(
              float(np.max(np.abs(scheme_bias))) * 100, 3),
          atm_scheme_bias_volpts=round(
              float(scheme_bias[np.argmin(np.abs(STRIKES - 1.0))]) * 100, 3))

    variants = [
        ("global", "global", False),
        ("local", "local", False),
        ("local_ema", "local_ema", False),
        ("global_ivw", "global", True),
        ("local_ivw", "local", True),
    ]
    curves = {}
    for tag, objective, weighted in variants:
        for seed in seeds:
            p, tr, wall = _train_surface(objective, weighted, seed=seed)
            prices = _model_smile(tr, p)
            model_iv = _iv(prices, p)
            curves[tag] = model_iv
            err_cf = model_iv - cf_iv
            err_disc = model_iv - disc_iv
            atm = np.argmin(np.abs(STRIKES - 1.0))
            _emit(study="r4_smile_objectives", variant=tag, seed=seed,
                  **{k: PROTO[k] for k in ("M", "N", "width", "x0_scale")},
                  iters=BUDGET,
                  mean_abs_iv_err_volpts=round(
                      float(np.mean(np.abs(err_cf))) * 100, 3),
                  max_abs_iv_err_volpts=round(
                      float(np.max(np.abs(err_cf))) * 100, 3),
                  atm_iv_err_volpts=round(float(err_cf[atm]) * 100, 3),
                  mean_abs_iv_err_vs_discrete_volpts=round(
                      float(np.mean(np.abs(err_disc))) * 100, 3),
                  atm_iv_err_vs_discrete_volpts=round(
                      float(err_disc[atm]) * 100, 3),
                  atm_model_iv=round(float(model_iv[atm]), 5),
                  atm_cf_iv=round(float(cf_iv[atm]), 5),
                  wall_time_s=round(wall, 1))

    _plot(curves, cf_iv, disc_iv, OUT_DIR / "heston_iv_smile_objectives.png")


def _plot(curves, cf_iv, disc_iv, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.5, 4.8))
    ax.plot(STRIKES, 100 * cf_iv, "k-", lw=2, label="Heston closed form")
    ax.plot(STRIKES, 100 * disc_iv, "k--", lw=1.2,
            label="discrete-N oracle D(N; S0)")
    for tag, iv in curves.items():
        ax.plot(STRIKES, 100 * iv, "o--", ms=3, label=tag)
    ax.set_xlabel("strike K (S0 = 1)")
    ax.set_ylabel("BS implied vol (%)")
    ax.set_title("Heston IV smile: objective variants vs oracles (t=0)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    path.parent.mkdir(exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)


def smile_winner_bigcfg(objective: str = "local", seeds=(0, 1, 2)):
    """The round-3 'best' geometry (M=1024, width=512, x0_scale=0.3) under
    the winning objective, 3 seeds — the ≤1-volpt acceptance gate."""
    from dnnpde_tpu.pde import HestonPDE

    p0 = HestonPDE()
    cf_iv = _iv(_cf_smile(p0), p0)
    atm = np.argmin(np.abs(STRIKES - 1.0))
    for seed in seeds:
        p, tr, wall = _train_surface(
            objective, weighted=False, seed=seed, M=1024, width=512,
            x0_scale=0.3,
        )
        model_iv = _iv(_model_smile(tr, p), p)
        err = model_iv - cf_iv
        _emit(study="r4_smile_winner_bigcfg", variant=objective, seed=seed,
              M=1024, width=512, x0_scale=0.3, iters=BUDGET,
              mean_abs_iv_err_volpts=round(
                  float(np.mean(np.abs(err))) * 100, 3),
              max_abs_iv_err_volpts=round(float(np.max(np.abs(err))) * 100, 3),
              atm_iv_err_volpts=round(float(err[atm]) * 100, 3),
              wall_time_s=round(wall, 1))


STUDIES = {
    "smile_objectives": smile_objectives,
    "smile_winner_bigcfg": smile_winner_bigcfg,
}


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args:
        print("usage: studies_r4.py <study> [args]", file=sys.stderr)
        sys.exit(2)
    name, rest = args[0], args[1:]
    if name == "smile_winner_bigcfg" and rest:
        smile_winner_bigcfg(rest[0])
    else:
        STUDIES[name]()
