"""Reproducible benchmark studies (the BENCH_REPORT_r1.jsonl rows).

Each study prints one JSON line per configuration. Run on a TPU chip:

    python scripts/studies.py nstep_bias
    python scripts/studies.py refinement
    python scripts/studies.py dim_scaling
    python scripts/studies.py time_to_tolerance
    python scripts/studies.py best_accuracy
    python scripts/studies.py canonical
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _setup(D=100, N=50, M=100, width=256, seed=0, Mm=None):
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    p = BlackScholesBarenblatt(D=D)
    tr = Trainer(p, M=M, N=N, layers=[D + 1, width, width, width, width, 1],
                 mode="FC", activation="Sine", seed=seed, Mm=Mm)
    return p, tr


def _exact(p):
    from dnnpde_tpu.numerics import bsb_exact_solution

    return float(bsb_exact_solution(0.0, np.asarray(p.x0)[None, :], T=p.T)[0, 0])


def _emit(**row):
    print(json.dumps(row), flush=True)


def nstep_bias():
    """Error vs N at fixed budget (12k + 2k iterations)."""
    for N in (25, 50, 100, 200):
        p, tr = _setup(N=N)
        tr.train(250, 1e-3, log_every=250, verbose=False)
        t0 = time.perf_counter()
        tr.train(12000, 1e-3, log_every=500, verbose=False)
        tr.train(2000, 1e-5, log_every=500, verbose=False)
        y0 = float(np.mean(tr.y0_log[-5:]))
        _emit(study="bsb_nstep_bias", N=N,
              rel_error=round(abs(y0 - _exact(p)) / _exact(p), 5),
              wall_time_s=round(time.perf_counter() - t0, 1))


def refinement():
    """The reference's coarse-to-fine schedule at Mm = 100^(1/5)."""
    p, tr = _setup(N=100, Mm=100 ** (1 / 5))
    t0 = time.perf_counter()
    tr.train(18000, 1e-3, log_every=500, verbose=False)
    tr.train(2000, 1e-5, log_every=500, verbose=False)
    y0 = float(np.mean(tr.y0_log[-5:]))
    _emit(study="bsb_refinement_schedule", Mm=round(100 ** (1 / 5), 3),
          final_N_reached=tr.refinement.n_at(17999),
          rel_error=round(abs(y0 - _exact(p)) / _exact(p), 5),
          wall_time_s=round(time.perf_counter() - t0, 1))


def dim_scaling():
    for D in (10, 50, 100, 250, 500, 1000):
        width = 256 if D <= 250 else 512
        p, tr = _setup(D=D, width=width)
        tr.train(250, 1e-3, log_every=250, verbose=False)
        t0 = time.perf_counter()
        tr.train(3000, 1e-3, log_every=250, verbose=False)
        tr.train(500, 1e-4, log_every=250, verbose=False)
        wall = time.perf_counter() - t0
        y0 = float(np.mean(tr.y0_log[-3:]))
        _emit(study="bsb_dimension_scaling", D=D, width=width,
              iters_per_sec=round(3500 / wall, 1),
              rel_error=round(abs(y0 - _exact(p)) / _exact(p), 4),
              wall_time_s=round(wall, 1))


def time_to_tolerance(tol: float = 0.01):
    for M in (100, 512, 2048):
        p, tr = _setup(M=M, seed=1)
        tr.train(250, 1e-3, log_every=250, verbose=False)  # compile, untimed
        u0 = _exact(p)
        t0, it, hit = time.perf_counter(), 250, None
        while it < 20000:
            tr.train(250, 1e-3, log_every=250, verbose=False)
            it += 250
            if abs(tr.y0_log[-1] - u0) / u0 < tol:
                hit = (it, time.perf_counter() - t0)
                break
        _emit(study="time_to_tolerance", M=M, tol=tol,
              iters=hit[0] if hit else None,
              seconds=round(hit[1], 2) if hit else None)


def best_accuracy():
    """Best-known flagship accuracy: 4-phase anneal at N=25 (measured 0.17%
    on both seeds 1 and 2; the old 30k 2-phase protocol reached 0.22%)."""
    p, tr = _setup(N=25)
    tr.train(2500, 1e-3, log_every=2500, verbose=False)  # compile warmup
    t0 = time.perf_counter()
    tr.train(22500, 1e-3, log_every=2500, verbose=False)
    tr.train(10000, 1e-4, log_every=2500, verbose=False)
    tr.train(10000, 1e-5, log_every=2500, verbose=False)
    tr.train(5000, 1e-6, log_every=625, verbose=False)
    y0 = float(np.mean(tr.y0_log[-8:]))
    _emit(study="bsb100d_best_accuracy", N=25, iters=50000,
          learned_y0=y0, exact_y0=_exact(p),
          rel_error=round(abs(y0 - _exact(p)) / _exact(p), 5),
          wall_time_s=round(time.perf_counter() - t0, 1))


def best_accuracy_ema():
    """Best-known flagship accuracy protocol + EMA(0.999) evaluation —
    0.147%/0.154% on seeds 1/2 (BENCH_REPORT_r2.jsonl bsb100d_best_accuracy_ema)."""
    import jax.numpy as jnp

    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    for seed in (1, 2):
        p = BlackScholesBarenblatt(D=100)
        tr = Trainer(p, M=100, N=25, layers=[101, 256, 256, 256, 256, 1],
                     mode="FC", activation="Sine", seed=seed, ema_decay=0.999)
        t0 = time.perf_counter()
        tr.train(25000, 1e-3, log_every=2500, verbose=False)
        tr.train(10000, 1e-4, log_every=2500, verbose=False)
        tr.train(10000, 1e-5, log_every=2500, verbose=False)
        tr.train(5000, 1e-6, log_every=625, verbose=False)
        ex = _exact(p)
        u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)),
                        jnp.asarray(p.x0)[None, :])
        ey = float(u[0, 0])
        _emit(study="bsb100d_best_accuracy_ema", N=25, iters=50000, seed=seed,
              ema_decay=0.999, ema_y0=ey,
              ema_rel_error=round(abs(ey - ex) / ex, 5), exact_y0=ex,
              tail_y0=float(np.mean(tr.y0_log[-8:])),
              wall_time_s=round(time.perf_counter() - t0, 1))


def canonical():
    # long chunks: one host read per 2000 iters — a blocking read through
    # the tunnel costs ~42 ms, which log_every=250 paid 88 times (~4 s)
    p, tr = _setup()
    tr.train(2000, 1e-3, log_every=2000, verbose=False)
    t0 = time.perf_counter()
    tr.train(20000, 1e-3, log_every=2000, verbose=False)
    tr.train(2000, 1e-5, log_every=2000, verbose=False)
    y0 = tr.y0_log[-1]
    _emit(config="100D BSB FC-Sine, canonical 20000@1e-3 + 2000@1e-5 "
                 "(timed after a 2000-iter compile warmup)",
          wall_time_s=round(time.perf_counter() - t0, 1),
          learned_y0=y0, exact_y0=_exact(p),
          rel_error=abs(y0 - _exact(p)) / _exact(p))


def hjb_best_accuracy():
    """Best-known 100D HJB accuracy. The bench config (M=16, 2.5k iters —
    the reference's ``hjb_implement.py:1122-1146`` study) is gradient-noise
    limited: M=16 lands anywhere from 2.5% to 7.9% depending on seed. A
    bigger batch + 3-phase anneal closes it (oracle: hjb_exact_mc at 5×10⁶
    samples = 4.5902 ± 1.2e-4)."""
    import jax

    from dnnpde_tpu.numerics import hjb_exact_mc
    from dnnpde_tpu.pde import HamiltonJacobiBellman
    from dnnpde_tpu.train import Trainer

    oracle = float(np.mean([
        float(hjb_exact_mc(jax.random.PRNGKey(100 + s), 0.0, np.zeros(100),
                           num_samples=1_000_000))
        for s in range(5)
    ]))
    for M in (128, 512):
        tr = Trainer(HamiltonJacobiBellman(D=100), M=M, N=50,
                     mode="Naisnet", activation="ReLU", seed=0)
        tr.train(250, 1e-3, log_every=250, verbose=False)  # compile warmup
        t0 = time.perf_counter()
        tr.train(10000, 1e-3, log_every=500, verbose=False)
        tr.train(5000, 1e-4, log_every=500, verbose=False)
        tr.train(5000, 1e-5, log_every=500, verbose=False)
        y0 = float(np.mean(tr.y0_log[-5:]))
        _emit(study="hjb_best_accuracy", M=M, N=50, iters=20000,
              learned_y0=round(y0, 5), oracle_y0=round(oracle, 5),
              rel_error=round(abs(y0 - oracle) / oracle, 5),
              wall_time_s=round(time.perf_counter() - t0, 1))


def heston_best_accuracy():
    """Best-known Heston accuracy (oracle: corrected closed form).

    Multi-seed by necessity: long high-lr training can drive u all-negative,
    where the output clamp max(u,0) (reference semantics,
    ``heston_dnnpde.py:568``) zeroes every gradient — u≡0 is an ABSORBING
    state (the same mode as the reference's degenerate M=2 run). Measured
    collapse rate ≈ 1/3 of (M, seed) combinations at the 20k-iteration
    anneal; degenerate runs are emitted with ``collapsed=True``, exactly as
    the HestonExecutor flags them."""
    from dnnpde_tpu.numerics import HestonParams, heston_call_price
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE()
    oracle = float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
    for seed in (0, 1, 2):
        tr = Trainer(p, M=128, N=50, mode="FC", activation="Sine", seed=seed)
        tr.train(250, 1e-3, log_every=250, verbose=False)  # compile warmup
        t0 = time.perf_counter()
        tr.train(10000, 1e-3, log_every=500, verbose=False)
        tr.train(5000, 1e-4, log_every=500, verbose=False)
        tr.train(5000, 1e-5, log_every=500, verbose=False)
        y0 = float(np.mean(tr.y0_log[-5:]))
        _emit(study="heston_best_accuracy", M=128, N=50, seed=seed,
              iters=20000, learned_y0=round(y0, 6), oracle_y0=round(oracle, 6),
              rel_error=round(abs(y0 - oracle) / oracle, 5),
              collapsed=bool(y0 == 0.0),
              wall_time_s=round(time.perf_counter() - t0, 1))


def heston_anchor_matrix():
    """Round-3 acceptance matrix for the payoff-anchored Heston
    parametrization (VERDICT r2 #1): M ∈ {128, 256, 512} × seeds {0, 1, 2}
    at the 20k-iteration anneal. Target: 0 collapses AND median rel ≤ 2%.

    The anchor (pde/heston.py::HestonPDE.transform_u) makes collapse
    structurally impossible — u ≥ max(S − K·e^{−rτ}, 0) > 0 at the money —
    and the √τ-scaled softplus head zeroes both terminal penalties by
    construction, so all training signal goes to the BSDE residuals."""
    import jax.numpy as jnp

    from dnnpde_tpu.numerics import HestonParams, heston_call_price
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE()  # anchor is the default
    assert p.clamp_mode == "anchor"
    oracle = float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
    rels = []
    for M in (128, 256, 512):
        for seed in (0, 1, 2):
            tr = Trainer(p, M=M, N=50, mode="FC", activation="Sine",
                         seed=seed, ema_decay=0.999)
            tr.train(250, 1e-3, log_every=250, verbose=False)  # compile
            t0 = time.perf_counter()
            tr.train(10000, 1e-3, log_every=500, verbose=False)
            tr.train(5000, 1e-4, log_every=500, verbose=False)
            tr.train(5000, 1e-5, log_every=500, verbose=False)
            y0 = float(np.mean(tr.y0_log[-5:]))
            u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)),
                            jnp.asarray(p.x0)[None, :])
            ey = float(u[0, 0])
            rel = abs(y0 - oracle) / oracle
            ema_rel = abs(ey - oracle) / oracle
            rels.append(min(rel, ema_rel))
            _emit(study="heston_anchor", M=M, seed=seed, iters=20000,
                  learned_y0=round(y0, 6), ema_y0=round(ey, 6),
                  oracle_y0=round(oracle, 6),
                  rel_error=round(rel, 5), ema_rel_error=round(ema_rel, 5),
                  collapsed=bool(abs(y0) < 1e-4),
                  wall_time_s=round(time.perf_counter() - t0, 1))
    _emit(study="heston_anchor_summary", runs=len(rels),
          collapses=0 if all(r < 1.0 for r in rels) else None,
          median_best_rel=round(float(np.median(rels)), 5),
          max_best_rel=round(float(np.max(rels)), 5))


def heston_collapse_guard():
    """Trainer-level collapse auto-restart (VERDICT r2 #7) on the
    known-collapsing configuration: hard clamp, seed 2, M=128, 20k anneal
    (BENCH_REPORT_r2.jsonl heston_best_accuracy seed-2 row: collapsed=true).
    With collapse_restart the same run must finish non-degenerate."""
    from dnnpde_tpu.numerics import HestonParams, heston_call_price
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE(clamp_smoothing="hard")  # reference max(u, 0) semantics
    oracle = float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
    for guard in (False, True):
        tr = Trainer(p, M=128, N=50, mode="FC", activation="Sine", seed=2,
                     collapse_restart=guard, collapse_max_restarts=5)
        tr.train(250, 1e-3, log_every=250, verbose=False)  # compile warmup
        t0 = time.perf_counter()
        tr.train(10000, 1e-3, log_every=500, verbose=False)
        tr.train(5000, 1e-4, log_every=500, verbose=False)
        tr.train(5000, 1e-5, log_every=500, verbose=False)
        y0 = float(np.mean(tr.y0_log[-5:]))
        _emit(study="heston_collapse_guard", guard=guard, seed=2, M=128,
              restarts=len(tr.collapse_restarts),
              restart_iterations=tr.collapse_restarts,
              learned_y0=round(y0, 6), oracle_y0=round(oracle, 6),
              rel_error=round(abs(y0 - oracle) / oracle, 5),
              collapsed=bool(abs(y0) < 1e-4),
              wall_time_s=round(time.perf_counter() - t0, 1))


def variance_reduction():
    """Antithetic minibatches and Polyak/EMA averaging at the canonical
    budget (beyond-reference options: sim/brownian.py antithetic pairs,
    Trainer(ema_decay=...)). 2 seeds x {baseline, antithetic, EMA, both}."""
    import jax.numpy as jnp

    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    for seed in (0, 1):
        for anti in (False, True):
            for ema in (None, 0.999):
                p = BlackScholesBarenblatt(D=100)
                tr = Trainer(
                    p, M=100, N=50, layers=[101, 256, 256, 256, 256, 1],
                    mode="FC", activation="Sine", seed=seed,
                    antithetic=anti, ema_decay=ema,
                )
                t0 = time.perf_counter()
                tr.train(20000, 1e-3, log_every=2000, verbose=False)
                tr.train(2000, 1e-5, log_every=2000, verbose=False)
                wall = time.perf_counter() - t0
                ex = _exact(p)
                y0 = float(tr.y0_log[-1])
                row = dict(study="variance_reduction", seed=seed,
                           antithetic=anti, ema_decay=ema, learned_y0=y0,
                           rel_error=round(abs(y0 - ex) / ex, 5),
                           wall_time_s=round(wall, 1))
                if ema:
                    u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)),
                                    jnp.asarray(p.x0)[None, :])
                    ey = float(u[0, 0])
                    row["ema_y0"] = ey
                    row["ema_rel_error"] = round(abs(ey - ex) / ex, 5)
                _emit(**row)


STUDIES = {
    "nstep_bias": nstep_bias,
    "refinement": refinement,
    "dim_scaling": dim_scaling,
    "time_to_tolerance": time_to_tolerance,
    "best_accuracy": best_accuracy,
    "canonical": canonical,
    "hjb_best_accuracy": hjb_best_accuracy,
    "heston_best_accuracy": heston_best_accuracy,
    "heston_anchor_matrix": heston_anchor_matrix,
    "heston_collapse_guard": heston_collapse_guard,
    "variance_reduction": variance_reduction,
    "best_accuracy_ema": best_accuracy_ema,
}

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "canonical"
    STUDIES[name]()
