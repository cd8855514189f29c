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
                   budget: int = BUDGET, output_mode: str = "plain"):
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.sim import lognormal_x0
    from dnnpde_tpu.solver import iv_space_weights
    from dnnpde_tpu.train import Trainer

    p = (HestonPDE(clamp_output=False) if output_mode == "plain"
         else HestonPDE(clamp_output=True, clamp_smoothing=output_mode))
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


def combo_matrix():
    """(objective ∈ {global, local}) × (output ∈ {plain, bs-tanh}) on the
    smile protocol — the round-4 default-selection matrix. The r3 story:
    plain+global floors at ~3.5 volpts; r4 found local+plain reaches ~1.0
    but with wiggly Γ (rel-L2 1.45). Hypothesis under test: bs carries Γ
    analytically, so local+bs should keep the smile win AND shippable Γ."""
    from dnnpde_tpu.pde import HestonPDE

    p0 = HestonPDE()
    cf_iv = _iv(_cf_smile(p0), p0)
    atm = np.argmin(np.abs(STRIKES - 1.0))
    for objective in ("global", "local"):
        for mode in ("bs",):
            p, tr, wall = _train_surface(objective, weighted=False,
                                         output_mode=mode)
            model_iv = _iv(_model_smile(tr, p), p)
            err = model_iv - cf_iv
            _emit(study="r4_smile_combo", objective=objective,
                  output_mode=mode, seed=0,
                  **{k: PROTO[k] for k in ("M", "N", "width", "x0_scale")},
                  iters=BUDGET,
                  mean_abs_iv_err_volpts=round(
                      float(np.mean(np.abs(err))) * 100, 3),
                  max_abs_iv_err_volpts=round(
                      float(np.max(np.abs(err))) * 100, 3),
                  atm_iv_err_volpts=round(float(err[atm]) * 100, 3),
                  wall_time_s=round(wall, 1))


def bs_anchor_matrix():
    """Point-solver acceptance matrix for the bs-tanh output mode under the
    default global objective — the VERDICT r3 #3 gate: M ∈ {128, 256, 512}
    × 3 seeds at the 20k anneal, EMA read; 0 collapses, median ≤ 2%,
    first-chunk compile < 60 s."""
    import time as _t

    import jax.numpy as jnp

    from dnnpde_tpu.numerics import HestonParams, heston_call_price
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE(clamp_output=True, clamp_smoothing="bs")
    cf = float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
    rels, collapses, first_compiles = [], 0, []
    for M in (128, 256, 512):
        tr = Trainer(p, M=M, N=50, mode="FC", activation="Sine", seed=0,
                     ema_decay=0.999)
        for seed in (0, 1, 2):
            tr.reset(seed)
            t0 = _t.perf_counter()
            first = seed == 0
            for it, lr in ((10000, 1e-3), (5000, 1e-4), (5000, 1e-5)):
                if first:
                    c0 = _t.perf_counter()
                tr.train(2000 if first else it, lr, log_every=2000,
                         verbose=False)
                if first:
                    first_compiles.append(round(_t.perf_counter() - c0, 1))
                    first = False
                    tr.train(it - 2000, lr, log_every=2000, verbose=False)
            u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)),
                            jnp.asarray(p.x0)[None, :])
            ey = float(u[0, 0])
            collapsed = bool(abs(ey) < 1e-3)
            collapses += collapsed
            rels.append(abs(ey - cf) / cf)
            _emit(study="r4_bs_anchor_matrix", M=M, seed=seed, N=50,
                  iters=20000, ema_y0=round(ey, 6), oracle_cf=round(cf, 6),
                  signed_rel=round((ey - cf) / cf, 5), collapsed=collapsed,
                  wall_time_s=round(_t.perf_counter() - t0, 1))
    _emit(study="r4_bs_anchor_matrix_summary", runs=len(rels),
          collapses=collapses,
          median_rel=round(float(np.median(rels)), 5),
          max_rel=round(float(np.max(rels)), 5),
          first_chunk_walls_s=first_compiles,
          target="0 collapses, median<=2%, first compile<60s")


def bigcfg_local_bs(seeds=(0, 1, 2)):
    """The final gate config: local objective + bs-tanh output at the
    round-3 best geometry (M=1024, width=512, x0_scale=0.3), 3 seeds."""
    from dnnpde_tpu.pde import HestonPDE

    p0 = HestonPDE()
    cf_iv = _iv(_cf_smile(p0), p0)
    atm = np.argmin(np.abs(STRIKES - 1.0))
    for seed in seeds:
        p, tr, wall = _train_surface(
            "local", weighted=False, seed=seed, M=1024, width=512,
            x0_scale=0.3, output_mode="bs",
        )
        model_iv = _iv(_model_smile(tr, p), p)
        err = model_iv - cf_iv
        _emit(study="r4_smile_bigcfg_local_bs", seed=seed,
              M=1024, width=512, x0_scale=0.3, iters=BUDGET,
              mean_abs_iv_err_volpts=round(
                  float(np.mean(np.abs(err))) * 100, 3),
              max_abs_iv_err_volpts=round(float(np.max(np.abs(err))) * 100, 3),
              atm_iv_err_volpts=round(float(err[atm]) * 100, 3),
              wall_time_s=round(wall, 1))


def replica_matrix():
    """VERDICT r3 #4 acceptance: the 9-run Heston acceptance matrix
    (M ∈ {128, 256, 512} × 3 seeds, 20k anneal, EMA read) reproduced as
    THREE vmapped programs (one per M, K=3 replicas each) via
    ``train_replicas``. Wall time is compared against the serial
    ``r4_bs_anchor_matrix`` rows measured in the same session (identical
    protocol and problem). Target: aggregate wall ≤ 40% of serial."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import HestonParams, heston_call_price
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import replica_values_at, train_replicas

    p = HestonPDE(clamp_output=True, clamp_smoothing="bs")
    cf = float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
    layers = [3, 256, 256, 256, 256, 1]
    total_wall = 0.0
    rels, collapses = [], 0
    for M in (128, 256, 512):
        res = train_replicas(
            p, seeds=(0, 1, 2),
            phases=[(10000, 1e-3), (5000, 1e-4), (5000, 1e-5)],
            M=M, N=50, layers=layers, ema_decay=0.999, log_every=2000,
        )
        u = replica_values_at(p, res, layers=layers)
        total_wall += res.wall_time
        for i, seed in enumerate(res.seeds):
            ey = float(u[i, 0])
            collapsed = bool(abs(ey) < 1e-3)
            collapses += collapsed
            rels.append(abs(ey - cf) / cf)
            _emit(study="r4_replica_matrix", M=M, seed=seed, N=50,
                  iters=20000, ema_y0=round(ey, 6), oracle_cf=round(cf, 6),
                  signed_rel=round((ey - cf) / cf, 5), collapsed=collapsed)
        _emit(study="r4_replica_matrix_wall", M=M, n_replicas=3,
              wall_time_s=round(res.wall_time, 1),
              compile_time_s=round(res.compile_time, 1))
    _emit(study="r4_replica_matrix_summary", runs=len(rels),
          collapses=collapses, median_rel=round(float(np.median(rels)), 5),
          max_rel=round(float(np.max(rels)), 5),
          total_wall_s=round(total_wall, 1),
          target="9 runs in <=40% of the serial r4_bs_anchor_matrix wall")


def dim1000_lr_width():
    """VERDICT r3 #5: lr/width scaling on D=1000 BSB (round-3 protocol:
    M=100, N=25, 20k 3-phase anneal, EMA-tail read). Rows sweep width ×
    lr-multiplier, with lr ∝ 1/width as the candidate rule (1.0 at
    width 512). Done = some width-1024 row ≤ the width-512 control."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import bsb_exact_solution
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    D, M, N = 1000, 100, 25
    p = BlackScholesBarenblatt(D=D)
    exact = float(bsb_exact_solution(
        0.0, np.asarray(p.x0)[None, :], T=p.T)[0, 0])
    for width, mult in (
        (512, 1.0),      # r3 control: 2.07%
        (1024, 1.0),     # r3 regression row: 3.9%
        (1024, 0.5),     # lr ∝ 1/width
        (1024, 0.25),
        (256, 2.0),      # the rule extrapolated the other way
        (256, 1.0),
        # is it the width or just the lower lr? width-512 at the same
        # reduced lrs separates the two explanations
        (512, 0.5),
        (512, 0.25),
    ):
        lr0 = 1e-3 * mult
        tr = Trainer(p, M=M, N=N,
                     layers=[D + 1, width, width, width, width, 1],
                     mode="FC", activation="Sine", seed=0, ema_decay=0.999)
        t0 = time.perf_counter()
        for it, lr in ((10000, lr0), (5000, lr0 / 10), (5000, lr0 / 100)):
            tr.train(it, lr, log_every=1000, verbose=False)
        u, _ = tr.net_u(
            tr.ema_params,
            jnp.zeros((1, 1)),
            jnp.asarray(p.x0)[None, :].astype(jnp.float32),
        )
        ey = float(u[0, 0])
        _emit(study="r4_dim1000_lr_width", D=D, width=width,
              lr_mult=mult, lr0=lr0, N=N, M=M, iters=20000,
              ema_y0=round(ey, 4), exact_y0=round(exact, 4),
              rel_error=round(abs(ey - exact) / exact, 5),
              wall_time_s=round(time.perf_counter() - t0, 1))


def basket_relu_median():
    """VERDICT r3 #6: the D=10 NAIS-Net ReLU seed-noise row under a
    5-seed-median protocol (train_replicas: one program per N) at the
    basket-matrix budget. Done = median |rel| ≤ 2% at N ∈ {50, 100}, or
    the row is deprecated with this data."""
    import jax

    from dnnpde_tpu.numerics import basket_call_mc
    from dnnpde_tpu.pde import BasketCallOption
    from dnnpde_tpu.train import replica_values_at, train_replicas

    p = BasketCallOption(D=10)
    oracle, se = basket_call_mc(
        jax.random.PRNGKey(0), np.asarray(p.x0), p.strike, p.T, p.r,
        p.sigma_bar, num_paths=2_000_000, payoff="mean",
    )
    oracle = float(oracle)
    layers = [11, 256, 256, 256, 256, 1]
    for N in (50, 100):
        res = train_replicas(
            p, seeds=(0, 1, 2, 3, 4),
            phases=[(10000, 1e-3), (5000, 1e-4), (5000, 1e-5)],
            M=100, N=N, layers=layers, mode="Naisnet", activation="ReLU",
            ema_decay=0.999, log_every=2000,
        )
        u = replica_values_at(p, res, layers=layers, mode="Naisnet",
                              activation="ReLU")
        vals = u[:, 0]
        rels = (vals - oracle) / oracle
        med = float(np.median(vals))
        _emit(study="r4_basket_relu_median", D=10, N=N, seeds=list(res.seeds),
              oracle=round(oracle, 6), oracle_se=round(float(se), 6),
              per_seed_rel=[round(float(r), 5) for r in rels],
              median_y0=round(med, 6),
              median_rel=round(abs(med - oracle) / oracle, 5),
              wall_time_s=round(res.wall_time, 1))


STUDIES = {
    "smile_objectives": smile_objectives,
    "smile_winner_bigcfg": smile_winner_bigcfg,
    "combo_matrix": combo_matrix,
    "bs_anchor_matrix": bs_anchor_matrix,
    "bigcfg_local_bs": bigcfg_local_bs,
    "replica_matrix": replica_matrix,
    "dim1000_lr_width": dim1000_lr_width,
    "basket_relu_median": basket_relu_median,
}





def local_cross_problem():
    """Is the local objective a general-purpose alternative or a
    surface-mode specialist? Point-mode (broadcast x0) comparison on the
    zoo at the 20k anneal + EMA read, global vs local, including the
    Z-coupled drivers (BSB's r(Y−XZ), HJB's ‖Z‖²) the Heston study never
    exercises."""
    import jax
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import (
        basket_call_mc, black_scholes_call, bsb_exact_solution, hjb_exact_mc,
    )
    from dnnpde_tpu.pde import (
        BasketCallOption, BlackScholesBarenblatt, CallOption1D,
        HamiltonJacobiBellman,
    )
    from dnnpde_tpu.train import Trainer

    bsb = BlackScholesBarenblatt(D=100)
    call = CallOption1D(D=1)
    basket = BasketCallOption(D=10)
    hjb = HamiltonJacobiBellman(D=100)
    oracles = {
        "bsb100": (bsb, float(bsb_exact_solution(
            0.0, np.asarray(bsb.x0)[None, :], T=bsb.T)[0, 0])),
        "call1d": (call, float(black_scholes_call(
            1.0, call.K, call.T, call.r, call.sigma_bar))),
        "basket10": (basket, float(basket_call_mc(
            jax.random.PRNGKey(0), np.asarray(basket.x0), basket.strike,
            basket.T, basket.r, basket.sigma_bar, num_paths=2_000_000,
            payoff="mean")[0])),
        "hjb100": (hjb, float(hjb_exact_mc(
            jax.random.PRNGKey(0), 0.0, np.asarray(hjb.x0),
            num_samples=100_000))),
    }
    for name, (p, oracle) in oracles.items():
        M = 128 if name == "hjb100" else 100
        for objective in ("global", "local"):
            tr = Trainer(p, M=M, N=50, mode="FC", activation="Sine",
                         seed=0, ema_decay=0.999, objective=objective)
            t0 = time.perf_counter()
            for it, lr in ((10000, 1e-3), (5000, 1e-4), (5000, 1e-5)):
                tr.train(it, lr, log_every=2000, verbose=False)
            u, _ = tr.net_u(
                tr.ema_params, jnp.zeros((1, 1)),
                jnp.asarray(p.x0, jnp.float32)[None, :],
            )
            ey = float(u[0, 0])
            _emit(study="r4_local_cross_problem", problem=name,
                  objective=objective, M=M, N=50, iters=20000,
                  ema_y0=round(ey, 6), oracle=round(oracle, 6),
                  rel_error=round(abs(ey - oracle) / abs(oracle), 5),
                  wall_time_s=round(time.perf_counter() - t0, 1))


def polish_gate(seeds=(0, 1, 2)):
    """VERDICT r3 #7 acceptance on TPU: warm two-phase Adam start, then the
    deterministic frozen-batch LBFGS polish (M=8192 antithetic, 1500
    steps — CPU probes showed 400 steps underconverge on some seeds:
    seed 1 landed 6.1% at 400 and 1.18% at 1500). Gate: rel ≤ 5% per
    seed (the round-2/3 waiver was 12% tail-mean)."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import black_scholes_call
    from dnnpde_tpu.pde import CallOption1D
    from dnnpde_tpu.train import Trainer

    p = CallOption1D(D=1)
    bs = float(black_scholes_call(1.0, p.K, p.T, p.r, p.sigma_bar))
    for seed in seeds:
        tr = Trainer(p, M=256, N=10, layers=[2, 32, 32, 32, 32, 1],
                     seed=seed)
        t0 = time.perf_counter()
        tr.train(800, 1e-3, "Adam", log_every=400, verbose=False)
        tr.train(200, 1e-4, "Adam", log_every=200, verbose=False)
        warm_u = float(tr.net_u(
            tr.params, jnp.zeros((1, 1)),
            jnp.asarray([[1.0]], jnp.float32))[0][0, 0])
        losses = tr.polish(n_iter=1500, M=8192, seed=123)
        _emit(study="r4_polish_gate", seed=seed, warm_rel=round(
                  abs(warm_u - bs) / bs, 5),
              polished_rel=round(abs(tr.y0_log[-1] - bs) / bs, 5),
              lbfgs_loss_first=round(float(losses[0]), 3),
              lbfgs_loss_last=round(float(losses[-1]), 3),
              oracle_bs=round(bs, 6),
              wall_time_s=round(time.perf_counter() - t0, 1))


def surface_executor(seeds=(0, 1, 2)):
    """One-call reproduction of the round-4 surface result through the
    PACKAGED driver (experiments.HestonSurfaceExecutor at its defaults) —
    the same recipe the ad-hoc bigcfg_local_bs study measured at
    0.13-0.16 volpts, now via the public API, with the discrete-N oracle
    smile scored in the same run. Artifacts land in results_r4/."""
    from dnnpde_tpu.experiments import HestonSurfaceExecutor, SurfaceConfig

    for seed in seeds:
        cfg = SurfaceConfig(seed=seed, discrete_oracle_paths=4_194_304,
                            smile_t_evals=(0.0, 0.25, 0.5))
        rep = HestonSurfaceExecutor(cfg, str(OUT_DIR)).execute()
        for row in rep.rows:
            _emit(study="r4_surface_executor", **{
                k: (round(v, 6) if isinstance(v, float) else v)
                for k, v in row.items()})


STUDIES["surface_executor"] = surface_executor


def calibration_roundtrip(seed=0):
    """Flagship pipeline demo: train the surface net ONCE, read its whole
    (t, K) price surface (3 maturities x 23 strikes via homogeneity), and
    CALIBRATE the Heston parameters back out of it with
    numerics.calibrate_heston (Adam on the exact differentiable closed
    form), starting from a deliberately-wrong initial guess.

    The control row calibrates to the closed form's OWN quotes on the
    identical grid + init + budget — the identifiability floor of the grid
    itself (rho/kappa are weakly identified by a short-maturity surface);
    the model row's parameter errors are meaningful only relative to it.
    Beyond-reference: the reference has no calibration workflow at all
    (its pricer is non-differentiable scipy.quad, sv_heston.py:51-58)."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import (
        HestonParams, calibrate_heston, heston_call_price)

    p, tr, wall = _train_surface(
        "local", False, seed=seed, M=1024, width=512, x0_scale=0.3,
        budget=BUDGET, output_mode="bs")

    ts = (0.0, 0.25, 0.5)
    S_eval = (1.0 / STRIKES).astype(np.float32)
    X = jnp.stack([jnp.asarray(S_eval),
                   jnp.full_like(jnp.asarray(S_eval), p.v0)], axis=-1)
    Kg, Tg, quotes_model, quotes_cf = [], [], [], []
    for t in ts:
        u, _ = tr.net_u(tr.ema_params, jnp.full((len(STRIKES), 1), t), X)
        quotes_model.extend((STRIKES * np.asarray(u[:, 0])).tolist())
        quotes_cf.extend(
            float(heston_call_price(1.0, p.v0, HestonParams(
                K=float(k), r=p.r, T=p.T - t, kappa=p.kappa, theta=p.theta,
                sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
            for k in STRIKES)
        Kg.extend(STRIKES.tolist())
        Tg.extend([p.T - t] * len(STRIKES))

    true = dict(kappa=p.kappa, theta=p.theta, sigma=p.sigma_v,
                rho=p.rho, v0=p.v0)
    # every parameter 30-50% off the truth
    init = HestonParams(K=1.0, r=p.r, T=p.T, kappa=1.2, theta=0.12,
                        sigma=0.45, rho=0.4, v0=0.3)
    for label, quotes in (("closed_form_control", quotes_cf),
                          ("model_surface", quotes_model)):
        res = calibrate_heston(1.0, Kg, Tg, quotes, r=p.r, init=init,
                               n_iter=2000, lr=0.02)
        f = res.params
        _emit(study="r4_calibration_roundtrip", quotes=label, seed=seed,
              n_quotes=len(quotes), rmse_rel=round(res.rmse_rel, 6),
              feller=round(float(res.feller), 4),
              train_wall_s=round(wall, 1),
              **{f"fit_{k}": round(float(getattr(f, a)), 4)
                 for k, a in (("kappa", "kappa"), ("theta", "theta"),
                              ("sigma", "sigma"), ("rho", "rho"),
                              ("v0", "v0"))},
              **{f"abs_err_{k}": round(abs(float(getattr(f, a)) - true[k]), 4)
                 for k, a in (("kappa", "kappa"), ("theta", "theta"),
                              ("sigma", "sigma"), ("rho", "rho"),
                              ("v0", "v0"))})


STUDIES["calibration_roundtrip"] = calibration_roundtrip


def american_put(seeds=(0, 1, 2), N=50, M=1024, budget=20000):
    """Optimal stopping: Bermudan-N put via the reflected local objective,
    scored against the MATCHING CRR Bermudan-N tree (exercise dates = the
    solver grid) and the full American tree. Arms: plain local (self-
    targets — known max-overestimation risk, the deep-RL bootstrap bias)
    vs local_ema (frozen EMA shadow targets — the target-network cure).
    Beyond-reference: no early exercise exists anywhere in the reference."""
    from dnnpde_tpu.numerics import crr_binomial
    from dnnpde_tpu.pde import AmericanPutOption
    from dnnpde_tpu.train import Trainer

    p = AmericanPutOption()
    n_tree = 80 * N
    berm = crr_binomial(1.0, p.K, p.T, p.r, p.sigma_bar, n_steps=n_tree,
                        payoff="put", american=True, exercise_every=n_tree // N)
    amer = crr_binomial(1.0, p.K, p.T, p.r, p.sigma_bar, n_steps=n_tree,
                        payoff="put", american=True)
    euro = crr_binomial(1.0, p.K, p.T, p.r, p.sigma_bar, n_steps=n_tree,
                        payoff="put", american=False)
    for objective in ("local", "local_ema"):
        for seed in seeds:
            t0 = time.perf_counter()
            tr = Trainer(p, M=M, N=N, layers=[2, 256, 256, 256, 256, 1],
                         mode="FC", activation="Sine", seed=seed,
                         ema_decay=0.999, objective=objective)
            half, quarter = budget // 2, budget // 4
            for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
                tr.train(it, lr, log_every=2000, verbose=False)
            y0 = float(tr.y0_log[-1])
            _emit(study="r4_american_put", objective=objective, seed=seed,
                  M=M, N=N, budget=budget, learned_y0=round(y0, 6),
                  oracle_bermudan_n=round(berm, 6),
                  oracle_american=round(amer, 6),
                  oracle_european=round(euro, 6),
                  rel_err_vs_bermudan=round(abs(y0 - berm) / berm, 5),
                  premium_captured=round((y0 - euro) / (berm - euro), 4),
                  wall_time_s=round(time.perf_counter() - t0, 1))


STUDIES["american_put"] = american_put


def american_put_head(seeds=(0, 1, 2), N=50, M=1024, budget=20000):
    """Arm 2 of the optimal-stopping study: the European control-variate
    head (AmericanPutOption(bs_head=True) — net learns only the
    non-negative premium over the closed-form European put). Hypothesis:
    the max-bias of the plain local arm (+2.4–3.9% measured,
    "r4_american_put") is approximation wiggle near the exercise boundary;
    the head shrinks the learned function 10x, so the wiggle — and the
    bias — should shrink with it. local_ema is retried here too: its
    cold-start failure (−24%) should vanish when the init already prices
    the European contract."""
    from dnnpde_tpu.numerics import crr_binomial
    from dnnpde_tpu.pde import AmericanPutOption
    from dnnpde_tpu.train import Trainer

    p = AmericanPutOption(bs_head=True)
    n_tree = 80 * N
    kw = dict(S0=1.0, K=p.K, T=p.T, r=p.r, sigma=p.sigma_bar,
              n_steps=n_tree, payoff="put")
    berm = crr_binomial(american=True, exercise_every=n_tree // N, **kw)
    amer = crr_binomial(american=True, **kw)
    euro = crr_binomial(american=False, **kw)
    for objective in ("local", "local_ema"):
        for seed in seeds:
            t0 = time.perf_counter()
            tr = Trainer(p, M=M, N=N, layers=[2, 256, 256, 256, 256, 1],
                         mode="FC", activation="Sine", seed=seed,
                         ema_decay=0.999, objective=objective)
            half, quarter = budget // 2, budget // 4
            for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
                tr.train(it, lr, log_every=2000, verbose=False)
            y0 = float(tr.y0_log[-1])
            _emit(study="r4_american_put_head", objective=objective,
                  seed=seed, M=M, N=N, budget=budget,
                  learned_y0=round(y0, 6),
                  oracle_bermudan_n=round(berm, 6),
                  oracle_american=round(amer, 6),
                  oracle_european=round(euro, 6),
                  rel_err_vs_bermudan=round(abs(y0 - berm) / berm, 5),
                  premium_captured=round((y0 - euro) / (berm - euro), 4),
                  wall_time_s=round(time.perf_counter() - t0, 1))


STUDIES["american_put_head"] = american_put_head


def american_surface(seeds=(0, 1, 2), N=50, M=1024, budget=20000):
    """Surface-mode optimal stopping: train the American put over the
    lognormal X0 region, then grade it as a SURFACE — value rel-L2 vs
    per-point Bermudan trees at several read times (each tree prices the
    remaining contract: maturity T−t, exercise dates = the remaining
    solver grid) and the EXERCISE BOUNDARY S*(t), extracted with the same
    rule from model and oracle (largest S with premium ≤ 1e-4). The
    boundary is the classic American-pricing deliverable; nothing in the
    reference prices early exercise at all."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import crr_binomial
    from dnnpde_tpu.pde import AmericanPutOption
    from dnnpde_tpu.sim import lognormal_x0
    from dnnpde_tpu.train import Trainer

    p = AmericanPutOption()
    S = np.linspace(0.6, 1.4, 81)
    eps = 1e-4
    # read times snapped to the solver grid (k/N for integer k)
    t_reads = (0.0, 0.24, 0.5, 0.76)

    def boundary(premium):
        """Exercise boundary: the last S of the CONTIGUOUS low-S exercise
        region (premium ≤ eps) before the first exit into continuation.
        (A global 'largest S with premium ≤ eps' would false-trigger deep
        OTM, where value ≈ intrinsic ≈ 0 too.) NaN if the grid starts
        already in continuation."""
        above = premium > eps
        if not above.any():
            return float("nan")
        first = int(np.argmax(above))
        return float(S[first - 1]) if first > 0 else float("nan")

    oracle_cache = {}
    for t in t_reads:
        n_rem = max(int(round(N * (p.T - t) / p.T)), 1)
        n_tree = 80 * n_rem
        vals = np.asarray([
            crr_binomial(float(s), p.K, p.T - t, p.r, p.sigma_bar,
                         n_steps=n_tree, payoff="put", american=True,
                         exercise_every=80)
            for s in S
        ])
        oracle_cache[t] = vals

    for seed in seeds:
        t0 = time.perf_counter()
        tr = Trainer(p, M=M, N=N, layers=[2, 256, 256, 256, 256, 1],
                     mode="FC", activation="Sine", seed=seed,
                     ema_decay=0.999, objective="local",
                     x0_sampler=lognormal_x0(p.x0, 0.3))
        half, quarter = budget // 2, budget // 4
        for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
            tr.train(it, lr, log_every=2000, verbose=False)
        wall = time.perf_counter() - t0
        X = jnp.asarray(S[:, None], jnp.float32)
        intrinsic = np.maximum(p.K - S, 0.0)
        for t in t_reads:
            tcol = jnp.full((len(S), 1), float(t), jnp.float32)
            u, _ = tr.net_u(tr.ema_params, tcol, X)
            V = np.asarray(p.value_u(X, u))[:, 0]
            o = oracle_cache[t]
            rel_l2 = float(np.linalg.norm(V - o) / np.linalg.norm(o))
            b_m, b_o = boundary(V - intrinsic), boundary(o - intrinsic)
            _emit(study="r4_american_surface", seed=seed, t=float(t),
                  M=M, N=N, budget=budget,
                  value_rel_l2=round(rel_l2, 6),
                  boundary_model=round(b_m, 4), boundary_tree=round(b_o, 4),
                  boundary_abs_err=round(abs(b_m - b_o), 4),
                  wall_time_s=round(wall, 1))


STUDIES["american_surface"] = american_surface


def serve_bench(batches=(1024, 16384, 131072), iters=50):
    """Serving-path throughput on the real chip: export the flagship BSB
    solution (D=100, width-256 FC-Sine) as the portable StableHLO artifact
    and measure the hot path — (u, Z=∇ₓu) per evaluation, i.e. price +
    100 greeks per point. Reported per batch size: steady-state
    evaluations/s (pipelined device calls, one terminal block), plus
    artifact size and export/load/first-call walls. The reference's only
    'serving' is re-loading a torch pickle into the training codebase
    (1d_BSPDE_case.py:453-464) and has no measured serving path at all."""
    import jax

    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.serve import load_solution, save_solution
    from dnnpde_tpu.train import Trainer

    p = BlackScholesBarenblatt(D=100, T=1.0)
    tr = Trainer(p, M=100, N=50, mode="FC", activation="Sine", seed=0,
                 ema_decay=0.999)
    tr.train(2000, 1e-3, log_every=1000, verbose=False)

    path = str(OUT_DIR / "bsb100_served.stablehlo")
    t0 = time.perf_counter()
    save_solution(path, tr, use_ema=True)
    export_s = time.perf_counter() - t0
    import os

    t0 = time.perf_counter()
    served = load_solution(path)
    load_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    for b in batches:
        X = np.asarray(rng.lognormal(0.0, 0.2, size=(b, 100)), np.float32)
        t = np.zeros((b, 1), np.float32)
        t0 = time.perf_counter()
        u, Z = served.u_and_grad_device(t, X)
        jax.block_until_ready((u, Z))
        first_call_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            u, Z = served.u_and_grad_device(t, X)
        jax.block_until_ready((u, Z))
        dt = time.perf_counter() - t0
        _emit(study="r4_serve_bench", batch=b, iters=iters,
              evals_per_sec=round(b * iters / dt, 1),
              us_per_eval=round(dt / (b * iters) * 1e6, 3),
              first_call_s=round(first_call_s, 2),
              artifact_kb=round(os.path.getsize(path) / 1024, 1),
              export_s=round(export_s, 2), load_s=round(load_s, 2))


STUDIES["serve_bench"] = serve_bench


def barrier_call(seeds=(0, 1, 2), N=50, M=1024, budget=20000):
    """Path-dependent payoffs: discretely-monitored up-and-out call via
    the post_step state hook, gated against the EXACT discrete oracle
    (same Euler + post_step chain). Arms: local objective (the shipped
    recipe — the value process jumps at knockout dates and the one-step
    targets absorb it) for smooth (β=50) and hard monitors, plus ONE
    global-objective control (measured −44% at the CPU test budget).
    Beyond-reference: every reference payoff is terminal-state-only."""
    from dnnpde_tpu.numerics import discrete_bsde_value
    from dnnpde_tpu.pde import UpAndOutCall
    from dnnpde_tpu.train import Trainer

    problems = {
        "smooth": UpAndOutCall(),
        "hard": UpAndOutCall(smooth_beta=None),
    }
    oracles = {
        k: discrete_bsde_value(p, N=N, n_paths=4_194_304, seed=99)
        for k, p in problems.items()
    }

    def run(monitor, objective, seed):
        p = problems[monitor]
        d = oracles[monitor]
        t0 = time.perf_counter()
        tr = Trainer(p, M=M, N=N, layers=[3, 256, 256, 256, 256, 1],
                     mode="FC", activation="Sine", seed=seed,
                     ema_decay=0.999, objective=objective)
        half, quarter = budget // 2, budget // 4
        for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
            tr.train(it, lr, log_every=2000, verbose=False)
        y0 = float(tr.y0_log[-1])
        _emit(study="r4_barrier_call", monitor=monitor, objective=objective,
              seed=seed, M=M, N=N, budget=budget, learned_y0=round(y0, 6),
              oracle_discrete=round(float(d.value), 6),
              oracle_se=round(float(d.standard_error), 8),
              rel_err=round(abs(y0 - d.value) / d.value, 5),
              wall_time_s=round(time.perf_counter() - t0, 1),
              **({} if objective == "local"
                 else {"semantics": "lever-shootout"}))

    for monitor in ("smooth", "hard"):
        for seed in seeds:
            run(monitor, "local", seed)
    run("smooth", "global", 0)  # the measured control


STUDIES["barrier_call"] = barrier_call


def asian_lookback(seeds=(0, 1, 2), N=50, M=1024, budget=20000):
    """Path-dependent payoffs with CONTINUOUS running state (vs the
    barrier's jumps): arithmetic-average Asian call and floating-strike
    lookback call, each riding a post_step state coordinate. Gated
    against the EXACT discrete oracle (same Euler + post_step chain) and
    bracketed by independent closed forms: Kemna–Vorst geometric Asian
    (pathwise AM–GM lower bound) and Goldman–Sosin–Gatto continuous
    lookback (upper bound for discrete monitoring). Arms: local objective
    (shipped recipe) 3 seeds, one global control each. Beyond-reference:
    every reference payoff is terminal-state-only."""
    from dnnpde_tpu.numerics import (
        discrete_bsde_value,
        geometric_asian_call,
        lookback_call_floating,
    )
    from dnnpde_tpu.pde import AsianCallOption, LookbackCallOption
    from dnnpde_tpu.train import Trainer

    problems = {
        "asian": AsianCallOption(N_samples=N),
        "lookback": LookbackCallOption(),
    }
    oracles = {
        k: discrete_bsde_value(p, N=N, n_paths=4_194_304, seed=99)
        for k, p in problems.items()
    }
    brackets = {
        "asian": ("geometric_lower",
                  geometric_asian_call(1.0, problems["asian"].strike,
                                       problems["asian"].T,
                                       problems["asian"].r,
                                       problems["asian"].sigma_bar, N)),
        "lookback": ("continuous_upper",
                     lookback_call_floating(1.0, problems["lookback"].T,
                                            problems["lookback"].r,
                                            problems["lookback"].sigma_bar)),
    }

    def run(contract, objective, seed):
        p = problems[contract]
        d = oracles[contract]
        bname, bval = brackets[contract]
        t0 = time.perf_counter()
        tr = Trainer(p, M=M, N=N, layers=[3, 256, 256, 256, 256, 1],
                     mode="FC", activation="Sine", seed=seed,
                     ema_decay=0.999, objective=objective)
        half, quarter = budget // 2, budget // 4
        for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
            tr.train(it, lr, log_every=2000, verbose=False)
        y0 = float(tr.y0_log[-1])
        _emit(study="r4_asian_lookback", contract=contract,
              objective=objective, seed=seed, M=M, N=N, budget=budget,
              learned_y0=round(y0, 6),
              oracle_discrete=round(float(d.value), 6),
              oracle_se=round(float(d.standard_error), 8),
              rel_err=round(abs(y0 - d.value) / d.value, 5),
              closed_form_bracket=bname, bracket_value=round(float(bval), 6),
              wall_time_s=round(time.perf_counter() - t0, 1),
              **({} if objective == "local"
                 else {"semantics": "lever-shootout"}))

    for contract in ("asian", "lookback"):
        for seed in seeds:
            run(contract, "local", seed)
        run(contract, "global", 0)  # measured control


STUDIES["asian_lookback"] = asian_lookback


def neural_cv(n_paths=2_097_152, budget=20000):
    """Neural control-variate pricing (``evals.neural_cv_value``): the
    trained net's martingale Σ disc·Zᵀσ dW as an exactly-unbiased control
    for the discrete-value MC. Measured per contract: the variance-reduction
    factor (= equal-error path-count speedup), agreement with the
    independent discrete oracle, and the plain-MC control on the SAME
    paths. Contracts: vanilla 1D call, Heston (bs head default), and the
    smooth up-and-out barrier (post_step chain). Beyond-reference: the
    reference only ever reads trained models back through plots
    (``1d_BSPDE_case.py:453-464``)."""
    from dnnpde_tpu.evals import neural_cv_from_trainer
    from dnnpde_tpu.numerics import discrete_bsde_value
    from dnnpde_tpu.pde import CallOption1D, HestonPDE, UpAndOutCall
    from dnnpde_tpu.train import Trainer

    contracts = {
        "call1d": (CallOption1D(), dict(layers=[2, 256, 256, 256, 256, 1])),
        "heston": (HestonPDE(), dict(layers=[3, 256, 256, 256, 256, 1])),
        "barrier": (UpAndOutCall(), dict(layers=[3, 256, 256, 256, 256, 1],
                                         objective="local")),
    }
    for name, (p, kw) in contracts.items():
        d = discrete_bsde_value(p, N=50, n_paths=4_194_304, seed=99)
        t0 = time.perf_counter()
        tr = Trainer(p, M=1024, N=50, mode="FC", activation="Sine",
                     seed=0, ema_decay=0.999, **kw)
        half, quarter = budget // 2, budget // 4
        for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
            tr.train(it, lr, log_every=2000, verbose=False)
        train_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        cv = neural_cv_from_trainer(tr, n_paths=n_paths, seed=7,
                                    batch=262_144)
        cv_wall = time.perf_counter() - t0
        _emit(study="r4_neural_cv", contract=name, budget=budget,
              n_paths=cv.n_paths, N=cv.N,
              cv_value=round(cv.value, 7), cv_se=round(cv.standard_error, 9),
              plain_value=round(cv.plain_value, 7),
              plain_se=round(cv.plain_standard_error, 9),
              variance_reduction=round(cv.variance_reduction, 1),
              c=round(cv.c, 4),
              oracle_discrete=round(float(d.value), 7),
              oracle_se=round(float(d.standard_error), 9),
              z_gap_sigmas=round(
                  abs(cv.value - d.value)
                  / float(np.hypot(cv.standard_error, d.standard_error)), 2),
              train_wall_s=round(train_wall, 1),
              cv_wall_s=round(cv_wall, 1))


STUDIES["neural_cv"] = neural_cv


def heston_american(seeds=(0, 1, 2), N=50, M=1024, budget=20000):
    """American put under HESTON dynamics: optimal stopping composed with
    stochastic volatility — beyond both the reference (no early exercise)
    and the GBM American row (no tree exists for Heston; the matching
    oracle is Longstaff–Schwartz on the solver's exact Euler chain,
    ``numerics.lsmc_value``, two-pass so the reported value is the
    low-biased fresh-path policy value). Also emits the exact
    parity-European bound from the discrete call value of the same chain.
    Arms: local + bs-put head (default) 3 seeds, plain-output control."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import discrete_bsde_value, lsmc_value
    from dnnpde_tpu.pde import HestonAmericanPut, HestonPDE
    from dnnpde_tpu.train import Trainer

    ls = lsmc_value(HestonAmericanPut(), N=N, n_regression=262_144,
                    n_pricing=1_048_576, seed=99)
    call = discrete_bsde_value(HestonPDE(clamp_output=False), N=N,
                               n_paths=4_194_304, seed=98)
    p0 = HestonAmericanPut()
    disc = (1.0 + p0.r * p0.T / N) ** (-N)
    euro_put = call.value - p0.S0 + p0.strike * disc
    _emit(study="r4_heston_american", row="oracle", N=N,
          lsmc_value=round(float(ls.value), 7),
          lsmc_se=round(float(ls.standard_error), 8),
          lsmc_in_sample=round(float(ls.in_sample_value), 7),
          parity_euro_put=round(float(euro_put), 7),
          premium_rel=round(float(ls.value / euro_put - 1.0), 5))

    def run(head, seed):
        p = HestonAmericanPut(clamp_output=head)
        t0 = time.perf_counter()
        tr = Trainer(p, M=M, N=N, layers=[3, 256, 256, 256, 256, 1],
                     mode="FC", activation="Sine", seed=seed,
                     ema_decay=0.999, objective="local")
        half, quarter = budget // 2, budget // 4
        for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
            tr.train(it, lr, log_every=2000, verbose=False)
        u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)), p.x0[None, :])
        y0 = float(p.value_u(p.x0[None, :], u)[0, 0])
        _emit(study="r4_heston_american", head="bs" if head else "plain",
              seed=seed, M=M, N=N, budget=budget, learned_y0=round(y0, 6),
              oracle_lsmc=round(float(ls.value), 6),
              rel_err=round(abs(y0 - ls.value) / ls.value, 5),
              premium_captured=round(
                  (y0 - euro_put) / (ls.value - euro_put), 4),
              wall_time_s=round(time.perf_counter() - t0, 1),
              **({} if head else {"semantics": "lever-shootout"}))

    for seed in seeds:
        run(True, seed)
    run(False, 0)  # plain-output control


STUDIES["heston_american"] = heston_american


def heston_american_surface(seed_list=(0, 1), N=50, M=1024, budget=20000,
                            x0_scale=0.25):
    """Surface-mode American put under Heston: train once over the
    lognormal (S, v) X0 region, grade the t=0 VALUE surface and the
    EARLY-EXERCISE PREMIUM surface against per-point oracles on a 5×3
    (S, v) grid — LSMC (per-point policy value) for the American leg and
    the exact discrete-chain parity bound for the European leg. The
    premium is the hard part: it is the entire quantity the net's head
    leaves to be learned."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import discrete_bsde_surface, lsmc_value
    from dnnpde_tpu.pde import HestonAmericanPut, HestonPDE
    from dnnpde_tpu.sim import lognormal_x0
    from dnnpde_tpu.train import Trainer

    p = HestonAmericanPut()
    S_grid = (0.8, 0.9, 1.0, 1.1, 1.2)
    v_grid = (0.1, 0.2, 0.3)
    pts = np.array([[s, v] for v in v_grid for s in S_grid], np.float32)
    disc = (1.0 + p.r * p.T / N) ** (-N)

    # per-point oracles (training-free)
    t0 = time.perf_counter()
    amer = np.array([
        lsmc_value(p, N=N, n_regression=131_072, n_pricing=262_144,
                   seed=97, x0=pt).value
        for pt in pts
    ])
    calls = discrete_bsde_surface(HestonPDE(clamp_output=False), N=N,
                                  x0s=pts, n_paths=1_048_576, seed=96)
    euro = np.array([c.value for c in calls]) - pts[:, 0] + p.strike * disc
    prem = amer - euro
    _emit(study="r4_heston_american_surface", row="oracle", N=N,
          n_points=len(pts),
          amer_range=[round(float(amer.min()), 5),
                      round(float(amer.max()), 5)],
          premium_range=[round(float(prem.min()), 5),
                         round(float(prem.max()), 5)],
          oracle_wall_s=round(time.perf_counter() - t0, 1))

    X = jnp.asarray(pts)
    t0s = jnp.zeros((len(pts), 1))
    for seed in seed_list:
        t0 = time.perf_counter()
        tr = Trainer(p, M=M, N=N, layers=[3, 256, 256, 256, 256, 1],
                     mode="FC", activation="Sine", seed=seed,
                     ema_decay=0.999, objective="local",
                     x0_sampler=lognormal_x0(p.x0, x0_scale))
        half, quarter = budget // 2, budget // 4
        for it, lr in ((half, 1e-3), (quarter, 1e-4), (quarter, 1e-5)):
            tr.train(it, lr, log_every=2000, verbose=False)
        u, _ = tr.net_u(tr.ema_params, t0s, X)
        val = np.asarray(p.value_u(X, u))[:, 0]
        rel_l2 = float(np.linalg.norm(val - amer) / np.linalg.norm(amer))
        prem_model = val - euro
        prem_mae = float(np.abs(prem_model - prem).mean())
        _emit(study="r4_heston_american_surface", seed=seed, M=M, N=N,
              budget=budget, x0_scale=x0_scale,
              value_rel_l2=round(rel_l2, 5),
              max_abs_err=round(float(np.abs(val - amer).max()), 6),
              premium_mae=round(prem_mae, 6),
              premium_mean=round(float(prem.mean()), 6),
              wall_time_s=round(time.perf_counter() - t0, 1))


STUDIES["heston_american_surface"] = heston_american_surface


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args:
        print("usage: studies_r4.py <study> [args]", file=sys.stderr)
        sys.exit(2)
    name, rest = args[0], args[1:]
    if name == "smile_winner_bigcfg" and rest:
        smile_winner_bigcfg(rest[0])
    elif name in STUDIES:
        STUDIES[name]()
    else:
        globals()[name]()
