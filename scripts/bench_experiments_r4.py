"""Round-4 default-path throughput lever shoot-out (VERDICT r3 #2).

Measures the flagship training step (100D BSB FC-Sine, the bench.py
protocol: one jitted chunk per timing, long chunks so the tunnel's ~42 ms
blocking-read cost stays amortized) under each candidate lever, at the two
benchmark geometries M=100 (reference config) and M=2048 f32 (large-batch
path-steps row). One JSON line per (geometry, lever).

Levers (all measured, shipped only if they win without breaking parity):
  base          current defaults (r3 shipping config)
  unroll4       SolverConfig(unroll=4) — measured +3.8%/+1.4% in r3, unshipped
  dots_remat    remat with the dots_saveable checkpoint policy (M=2048 only)
  no_remat      remat off at M=2048 (the r2 measurement said remat wins)
  rbg / unsafe_rbg
                hardware-friendly PRNG impls for the in-chunk Brownian draws
                (threefry is the default; rbg variants are NOT guaranteed
                layout-invariant across shardings, so they can only ever be
                an opt-in single-chip lever)

Usage: python scripts/bench_experiments_r4.py [scenario ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

CHUNK_SMALL, ITERS_SMALL = 1000, 3000
CHUNK_LARGE, ITERS_LARGE = 500, 1000


def _emit(**row):
    print(json.dumps(row), flush=True)


def measure(M, iters, chunk, solver_config=None, rng_impl=None,
            net_kwargs=None):
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    N, D = 50, 100
    problem = BlackScholesBarenblatt(D=D, T=1.0)
    trainer = Trainer(
        problem, M=M, N=N, layers=[D + 1, 256, 256, 256, 256, 1],
        mode="FC", activation="Sine", seed=0, solver_config=solver_config,
        net_kwargs=net_kwargs,
    )
    if rng_impl is not None:
        trainer.key = jax.random.key(0, impl=rng_impl)
    trainer.train(chunk, 1e-3, "Adam", log_every=chunk, verbose=False)
    jax.block_until_ready(trainer.params)
    t0 = time.perf_counter()
    res = trainer.train(iters, 1e-3, "Adam", log_every=chunk, verbose=False)
    _ = float(res.graph[1][-1])
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    from dnnpde_tpu.solver import SolverConfig

    want = set(sys.argv[1:])

    def run(tag, M, **kw):
        if want and tag.split(":")[0] not in want:
            return
        if M == 100:
            ips = measure(M, ITERS_SMALL, CHUNK_SMALL, **kw)
        else:
            ips = measure(M, ITERS_LARGE, CHUNK_LARGE, **kw)
        _emit(study="r4_throughput_levers", semantics="lever-shootout",
              lever=tag, M=M, iters_per_sec=round(ips, 1),
              path_steps_per_sec=round(ips * M * 50))

    # --- M=100 (flagship row): auto policy is remat=False here -----------
    run("base", 100)
    run("unroll4", 100, solver_config=SolverConfig(remat=False, unroll=4))
    run("unroll8", 100, solver_config=SolverConfig(remat=False, unroll=8))
    run("rbg", 100, rng_impl="rbg")
    run("unsafe_rbg", 100, rng_impl="unsafe_rbg")
    run("unroll4_rbg", 100, solver_config=SolverConfig(remat=False, unroll=4),
        rng_impl="rbg")

    # --- M=2048 f32 (path-steps row): auto policy is remat=True here ------
    run("base", 2048)
    run("unroll4", 2048, solver_config=SolverConfig(remat=True, unroll=4))
    run("no_remat", 2048, solver_config=SolverConfig(remat=False))
    run("dots_remat", 2048,
        solver_config=SolverConfig(remat=True, remat_policy="dots_saveable"))
    run("dots_remat_unroll4", 2048,
        solver_config=SolverConfig(remat=True, remat_policy="dots_saveable",
                                   unroll=4))
    run("rbg", 2048, rng_impl="rbg")
    run("unsafe_rbg", 2048, rng_impl="unsafe_rbg")


if __name__ == "__main__":
    main()
