"""Round-5 measurement studies. Each study prints a human-readable log and
JSONL rows; run with `python scripts/studies_r5.py <study> [args]` and tee
into results_r5/<study>.log.

Studies:
  qmc_oracle     — QMC vs pseudo-random oracle SE at equal path budget +
                   n^-alpha convergence fit + bridge ablation.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg=""):
    print(msg, flush=True)


def row(**kw):
    print("JSONL " + json.dumps(kw), flush=True)


def qmc_oracle():
    from dnnpde_tpu.numerics import (
        black_scholes_call,
        discrete_bsde_value,
        discrete_bsde_value_qmc,
    )
    from dnnpde_tpu.pde import CallOption1D, HestonPDE, UpAndOutCall

    log("=== QMC oracle study (round 5) ===")
    log("Equal-path-budget SE: pseudo-random discrete oracle vs")
    log("Owen-scrambled Sobol + Brownian bridge on the SAME Euler chain.\n")

    problems = [
        ("call1d", CallOption1D(), 50),
        ("heston", HestonPDE(), 50),
        ("barrier", UpAndOutCall(), 50),
    ]
    total = 1_048_576  # pseudo oracle budget; QMC uses 65_536 x 16 = same
    for name, p, N in problems:
        t0 = time.time()
        d = discrete_bsde_value(p, N=N, n_paths=total, batch=262_144, seed=0)
        t_mc = time.time() - t0
        t0 = time.time()
        q = discrete_bsde_value_qmc(p, N=N, n_paths=65_536, n_replicates=16,
                                    seed=0)
        t_q = time.time() - t0
        ratio = d.standard_error / max(q.standard_error, 1e-16)
        log(f"[{name}] N={N} total_paths={total}")
        log(f"  pseudo : value={d.value:.6f} SE={d.standard_error:.2e} "
            f"({t_mc:.1f}s)")
        log(f"  qmc    : value={q.value:.6f} SE={q.standard_error:.2e} "
            f"({t_q:.1f}s)  SE ratio (pseudo/qmc) = {ratio:.1f}x")
        agree = abs(q.value - d.value) / np.hypot(q.standard_error,
                                                  d.standard_error)
        log(f"  |Δ| = {abs(q.value - d.value):.2e} = {agree:.2f} combined SE")
        row(study="qmc_oracle", problem=name, N=N, total_paths=total,
            pseudo_value=d.value, pseudo_se=d.standard_error,
            qmc_value=q.value, qmc_se=q.standard_error,
            se_ratio=ratio, agree_sigma=float(agree),
            semantics="oracle-comparison")
        log()

    log("--- n^-alpha convergence fit (call1d, N=32, R=8 scrambles) ---")
    p = CallOption1D()
    ns = [1024, 4096, 16384, 65536]
    ses = []
    for n in ns:
        q = discrete_bsde_value_qmc(p, N=32, n_paths=n, n_replicates=8,
                                    seed=100)
        ses.append(q.standard_error)
        log(f"  n={n:6d}  SE={q.standard_error:.3e}  value={q.value:.6f}")
        row(study="qmc_scaling", n=n, se=q.standard_error, value=q.value,
            semantics="oracle-comparison")
    alpha = -np.polyfit(np.log(ns), np.log(ses), 1)[0]
    log(f"  fitted SE ~ n^-alpha with alpha = {alpha:.2f} "
        f"(plain MC: 0.50; smooth-integrand QMC approaches 1.0)")
    row(study="qmc_scaling_fit", alpha=float(alpha),
        semantics="oracle-comparison")

    log("\n--- Brownian-bridge ablation (call1d, N=32, n=16384, R=8) ---")
    qb = discrete_bsde_value_qmc(p, N=32, n_paths=16384, n_replicates=8,
                                 seed=7, bridge=True)
    qt = discrete_bsde_value_qmc(p, N=32, n_paths=16384, n_replicates=8,
                                 seed=7, bridge=False)
    log(f"  bridge=True : SE={qb.standard_error:.3e}")
    log(f"  bridge=False: SE={qt.standard_error:.3e}  "
        f"(bridge gain = {qt.standard_error / qb.standard_error:.1f}x)")
    row(study="qmc_bridge_ablation", se_bridge=qb.standard_error,
        se_timeorder=qt.standard_error,
        gain=float(qt.standard_error / qb.standard_error),
        semantics="oracle-comparison")

    bs = float(black_scholes_call(1.0, p.K, p.T, p.r, p.sigma_bar))
    log(f"\nBlack-Scholes continuous-time reference (for context): {bs:.6f}")
    log("(QMC targets the DISCRETE chain value; the gap to BS is Euler "
        "bias, not estimator error.)")


STUDIES = {"qmc_oracle": qmc_oracle}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in STUDIES:
        log(f"usage: studies_r5.py {{{','.join(STUDIES)}}}")
        return 2
    STUDIES[sys.argv[1]]()
    return 0


if __name__ == "__main__":
    sys.exit(main())
