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


def max_call(dims=(2, 3, 5), seeds=(0, 1, 2), budget=20000, M=1024, N=45):
    """Multi-asset optimal stopping headline: the Bermudan max-call
    benchmark (VERDICT r4 #1). For each d, train 3 vmapped replicas with
    the reflected local objective + max-BS-call head and grade the EMA
    value at x0 against (a) the PUBLISHED Bermudan-9 values
    (Andersen–Broadie 2004 Table 2 / Becker–Cheridito–Jentzen 2019:
    d=2 → 13.902, d=3 → 18.69, d=5 → 26.15) and (b) this repo's own LSMC
    on the IDENTICAL exact chain (sorted-basis, full budget) with its SE.
    TWO reads per seed: the direct net value max(g, u(0, x0)) — which
    inherits the reflected objective's max-bootstrap bias (targets are
    maxes of noisy estimates; measured +1.2–1.5% here) — and the POLICY
    VALUE (evals.policy_value): fresh paths stopped by the net's own
    exercise rule, the exact-lower-bound protocol behind the published
    numbers themselves. Acceptance gates the policy value: median rel err
    vs published ≤ 0.5% per dimension."""
    import jax

    from dnnpde_tpu.evals import policy_value
    from dnnpde_tpu.nets import build_network
    from dnnpde_tpu.numerics import lsmc_value
    from dnnpde_tpu.pde import BermudanMaxCall
    from dnnpde_tpu.solver import make_net_u
    from dnnpde_tpu.train import replica_values_at, train_replicas

    published = {2: 13.902, 3: 18.69, 5: 26.15}
    phases = [(budget // 2, 1e-3), (budget // 4, 1e-4), (budget // 4, 1e-5)]
    log("=== Bermudan max-call study (round 5) ===")
    for D in dims:
        p = BermudanMaxCall(D=D, N_steps=N)
        t0 = time.time()
        ls = lsmc_value(p, N=N, n_regression=131_072, n_pricing=524_288,
                        seed=0, basis="sorted")
        t_ls = time.time() - t0
        pub = published.get(D)
        log(f"[d={D}] LSMC {ls.value:.4f} ± {ls.standard_error:.4f} "
            f"({t_ls:.0f}s)  published {pub}")
        layers = [D + 1, 256, 256, 256, 256, 1]
        res = train_replicas(
            p, seeds=seeds, phases=phases, M=M, N=N, layers=layers,
            ema_decay=0.999, objective="local", log_every=2000,
        )
        u = replica_values_at(p, res, layers=layers)
        net = build_network("FC", layers, "Sine")
        net_u = make_net_u(net, transform=p.transform_u)
        rels = []
        for i, seed in enumerate(res.seeds):
            y0 = float(u[i, 0])
            params_i = jax.tree.map(lambda x: x[i], res.ema_params)
            pv = policy_value(p, net_u, params_i, N=N,
                              n_paths=1_048_576, seed=777)
            rel_pub = abs(pv.value - pub) / pub if pub else None
            rel_direct = abs(y0 - pub) / pub if pub else None
            z_lsmc = (pv.value - ls.value) / ls.standard_error
            rels.append(rel_pub)
            log(f"  seed {seed}: policy={pv.value:.4f}"
                f"±{pv.standard_error:.4f} (rel {100 * rel_pub:.2f}%)  "
                f"direct={y0:.4f} (rel {100 * rel_direct:.2f}%)  "
                f"z vs LSMC {z_lsmc:+.1f}")
            row(study="max_call", D=D, seed=seed, M=M, N=N, budget=budget,
                policy_value=round(pv.value, 5),
                policy_se=round(pv.standard_error, 5),
                direct_y0=round(y0, 5), published=pub,
                lsmc=round(ls.value, 5),
                lsmc_se=round(ls.standard_error, 5),
                rel_err_vs_published=round(rel_pub, 5),
                rel_err_direct=round(rel_direct, 5),
                z_vs_lsmc=round(z_lsmc, 2),
                semantics="policy value (fresh-path lower bound from the "
                          "net's exercise rule — the published numbers' "
                          "own protocol) + direct EMA read, vs published "
                          "Bermudan-9 benchmark and own LSMC oracle")
        med = float(np.median(rels))
        ok = med <= 0.005
        log(f"  median policy rel err {100 * med:.2f}%  "
            f"wall {res.wall_time:.0f}s (compile {res.compile_time:.0f}s)"
            f"  -> {'OK' if ok else 'MISS'} (gate 0.5%)")
        row(study="max_call_summary", D=D, median_rel_err=round(med, 5),
            ok=ok, wall_time_s=round(res.wall_time, 1),
            compile_time_s=round(res.compile_time, 1),
            semantics="per-dimension acceptance: median policy value of "
                      "3 seeds vs published value, gate 0.5%")


STUDIES = {"qmc_oracle": qmc_oracle, "max_call": max_call}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in STUDIES:
        log(f"usage: studies_r5.py {{{','.join(STUDIES)}}}")
        return 2
    STUDIES[sys.argv[1]]()
    return 0


if __name__ == "__main__":
    sys.exit(main())
