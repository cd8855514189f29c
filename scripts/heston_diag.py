"""Diagnostics for the anchor parametrization's +4-5% high bias
(heston_anchor matrix, round 3): is it the √τ-head endgame discretization
(bias should shrink with N), the head scaling itself (anchor_time_scale
variants), or the anneal (longer fine phase)?

    python scripts/heston_diag.py            # all variants
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dnnpde_tpu.numerics import HestonParams, heston_call_price
from dnnpde_tpu.pde import HestonPDE
from dnnpde_tpu.train import Trainer


def _emit(**row):
    print(json.dumps(row), flush=True)


def run(tag, p, N=50, seeds=(0, 1), phases=((10000, 1e-3), (5000, 1e-4), (5000, 1e-5))):
    oracle = float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
    tr = Trainer(p, M=128, N=N, mode="FC", activation="Sine", seed=0)
    for seed in seeds:
        tr.reset(seed)
        tr.train(250, 1e-3, log_every=250, verbose=False)
        t0 = time.perf_counter()
        for n_it, lr in phases:
            tr.train(n_it, lr, log_every=500, verbose=False)
        y0 = float(np.mean(tr.y0_log[-5:]))
        _emit(study="heston_diag", variant=tag, N=N, seed=seed,
              learned_y0=round(y0, 6), oracle_y0=round(oracle, 6),
              rel_error=round((y0 - oracle) / oracle, 5),  # SIGNED
              wall_s=round(time.perf_counter() - t0, 1))


def main():
    # 1. N dependence of the sqrt-anchor bias (discretization hypothesis)
    for N in (25, 50, 100):
        run(f"anchor_sqrt_N{N}", HestonPDE(clamp_output=True), N=N, seeds=(0,))
    # 2. unscaled head (terminal condition via penalties)
    run("anchor_flat", HestonPDE(clamp_output=True, anchor_time_scale="none"), seeds=(0, 1))
    # 3. longer fine anneal on the default
    run("anchor_sqrt_longfine", HestonPDE(clamp_output=True), seeds=(0,),
        phases=((10000, 1e-3), (5000, 1e-4), (10000, 1e-5), (5000, 1e-6)))


if __name__ == "__main__":
    main()
