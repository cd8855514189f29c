"""Measured performance story for the 100D BSB train step (VERDICT r1 item 2).

Produces results_r2/profile_summary.json with, per batch size M:
  - iters/s and path-steps/s (M*N per iter) of the full jitted training chunk
  - per-iteration FLOPs counted by XLA on a loop-free lowering (lax.scan is
    monkeypatched to a Python loop during tracing, so the HLO has no while
    loops and cost_analysis counts every op; XLA's while-body costs are
    otherwise counted once regardless of trip count)
  - achieved TFLOP/s and MFU vs (a) the v5e bf16 peak 197 TFLOP/s and (b) a
    measured same-session matmul ceiling (4096^3 bf16 chain probe)
  - a jax.profiler trace breakdown: device-busy fraction, fwd/bwd while
    split, and the share of device time inside dot-containing fusions vs
    dynamic-update-slice (backward saves / stacking) vs other
  - the measured cost of Brownian-increment generation (the candidate for a
    fused Pallas kernel, SURVEY §2.6): an in-scan gen+reduce probe.

Run: python scripts/profile_train_step.py [--quick]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

REPO = Path(__file__).resolve().parent.parent
import sys

if str(REPO) not in sys.path:  # `python scripts/...py` puts scripts/ first
    sys.path.insert(0, str(REPO))
V5E_BF16_PEAK_TFLOPS = 197.0  # public v5e spec

N, D = 50, 100
WIDTH = 256  # overridable via --width: the reference's 256 underfills the MXU
LAYERS = [D + 1, WIDTH, WIDTH, WIDTH, WIDTH, 1]
CHUNK = 100


def _sync(x) -> float:
    """Host read — the only reliable sync through the axon tunnel."""
    return float(jnp.asarray(x).reshape(-1)[0])


# --------------------------------------------------------------- matmul probe
def matmul_ceiling_tflops(n: int = 4096, reps: int = 3, chain: int = 100) -> float:
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        def body(c, _):
            return jnp.tanh(c @ b), None

        c, _ = jax.lax.scan(body, a, None, length=chain)
        return c

    _sync(mm(a, b))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = mm(a, b)
    _sync(r)
    dt = (time.perf_counter() - t0) / reps
    return 2 * n**3 * chain / dt / 1e12


# ------------------------------------------------------------------ FLOP count
def _python_scan(f, init, xs=None, length=None, reverse=False, unroll=1,
                 _split_transpose=False):
    """Trace-time unrolled scan (FLOP counting only — no while loops in HLO)."""
    n = length if xs is None else jax.tree.leaves(xs)[0].shape[0]
    idxs = range(n - 1, -1, -1) if reverse else range(n)
    carry, ys = init, []
    for i in idxs:
        x = None if xs is None else jax.tree.map(lambda a: a[i], xs)
        carry, y = f(carry, x)
        ys.append(y)
    if reverse:
        ys = ys[::-1]
    stacked = jax.tree.map(lambda *zs: jnp.stack(zs), *ys)
    return carry, stacked


def one_iter_flops(M: int, n_steps: int) -> float:
    """XLA-counted FLOPs of ONE full training iteration (dW generation +
    rollout + grad + Adam update) at batch M with n_steps time steps."""
    from dnnpde_tpu.nets import build_network
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.sim.brownian import brownian_increments, time_grid
    from dnnpde_tpu.solver import SolverConfig, make_loss_fn

    problem = BlackScholesBarenblatt(D=D, T=1.0)
    net = build_network("FC", LAYERS, "Sine")
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, D + 1)))
    # remat=False counts the ALGORITHMIC FLOPs (no recompute); the Trainer's
    # auto policy enables remat above ~1 GB of stash (M≥2048 f32 at this
    # geometry), where the executed program does ~1 extra forward of
    # recompute — achieved-TFLOP/s rows therefore understate device FLOPs
    # for remat configs.
    loss_fn = make_loss_fn(problem, net, SolverConfig(remat=False))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    ts = jnp.swapaxes(time_grid(M, n_steps, 1.0), 0, 1)
    x0 = jnp.broadcast_to(problem.x0, (M, D))
    dt = 1.0 / n_steps

    def full(params, opt_state, key):
        dW = brownian_increments(key, M, n_steps, D, dt, None, jnp.float32)
        dWs = jnp.swapaxes(dW, 0, 1)

        def lf(p):
            return loss_fn(p, ts, dWs, x0).loss

        loss, g = jax.value_and_grad(lf)(params)
        updates, new_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_state, loss

    orig_scan = jax.lax.scan
    jax.lax.scan = _python_scan
    try:
        lowered = jax.jit(full).lower(params, opt_state, jax.random.PRNGKey(1))
    finally:
        jax.lax.scan = orig_scan
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def per_iter_flops(M: int) -> float:
    """FLOPs at N=50 by exact linear extrapolation in N (count N=5 and N=10;
    every per-step cost is N-proportional, the remainder is N-independent)."""
    f5 = one_iter_flops(M, 5)
    f10 = one_iter_flops(M, 10)
    slope = (f10 - f5) / 5.0
    return f5 + slope * (N - 5)


# ------------------------------------------------------------------- timing
def time_train(M: int, iters: int, bf16: bool = False):
    """One chunk = one dispatch + one host read (~45 ms through the tunnel);
    timing a single long chunk keeps that constant under ~5%."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    problem = BlackScholesBarenblatt(D=D, T=1.0)
    net_kwargs = {"compute_dtype": "bfloat16"} if bf16 else None
    tr = Trainer(problem, M=M, N=N, layers=LAYERS, mode="FC",
                 activation="Sine", seed=0, net_kwargs=net_kwargs)
    tr.train(iters, 1e-3, "Adam", log_every=iters, verbose=False)  # compile
    t0 = time.perf_counter()
    res = tr.train(iters, 1e-3, "Adam", log_every=iters, verbose=False)
    _ = float(res.graph[1][-1])  # host read sync
    dt = time.perf_counter() - t0
    return iters / dt, tr


# ------------------------------------------------------------------ RNG probe
def rng_gen_us_per_iter(M: int, k: int = 1000) -> float:
    from dnnpde_tpu.sim.brownian import brownian_increments

    @jax.jit
    def genK(key):
        def body(c, kk):
            dW = brownian_increments(kk, M, N, D, 1.0 / N, None, jnp.float32)
            return c + dW.sum(), None

        keys = jax.random.split(key, k)
        s, _ = jax.lax.scan(body, 0.0, keys)
        return s

    _sync(genK(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    _sync(genK(jax.random.PRNGKey(1)))
    return (time.perf_counter() - t0) / k * 1e6


# ------------------------------------------------------------------- tracing
def trace_breakdown(trainer, M: int, trace_dir: str) -> dict:
    """Run one traced chunk; return device-time categories."""
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        res = trainer.train(CHUNK, 1e-3, "Adam", log_every=CHUNK, verbose=False)
        _ = float(res.graph[1][-1])

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return {"error": "no trace produced"}
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    procs = {e["pid"]: e["args"].get("name") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                str(procs.get(e.get("pid"), "")).startswith("/device"):
            dev[e["name"]] += e["dur"]

    # Containers: the jit_chunk region and its two inner whiles (fwd/bwd scan)
    chunk_us = max((v for k, v in dev.items() if k.startswith("jit_chunk")),
                   default=0.0)
    whiles = sorted((v for k, v in dev.items() if k.startswith("while")),
                    reverse=True)
    # whiles[0] = outer K-iteration scan; the next two = fwd and bwd N-scans
    inner = whiles[1:3] if len(whiles) >= 3 else []

    # Map fusion names to dot-content via the compiled HLO
    chunk = list(trainer._chunk_cache.values())[0]
    keys = jax.random.split(jax.random.PRNGKey(0), CHUNK)
    # third arg = the EMA shadow tree (empty pytree when EMA is off)
    txt = chunk.lower(
        trainer.params, trainer._opt_state, (), keys
    ).compile().as_text()
    comp_has_dot, cur = {}, None
    for ln in txt.splitlines():
        if ln and not ln[0].isspace() and "{" in ln:
            cur = ln.strip().split(" ")[0].lstrip("%")
            comp_has_dot[cur] = False
        # On this TPU backend matmuls lower to `convolution` HLOs, not `dot`.
        if cur and (" dot(" in ln or "convolution(" in ln):
            comp_has_dot[cur] = True
    fus2comp = {}
    for m in re.finditer(r"%?([\w\.\-]*fusion[\w\.\-]*) = [^\n]*calls=%?([\w\.\-]+)",
                         txt):
        fus2comp[m.group(1)] = m.group(2)

    dot_us = dus_us = other_us = 0.0
    for name, us in dev.items():
        if name.startswith(("while", "jit_", "copy")) or name.isdigit():
            continue
        if "dynamic-update-slice" in name or "dynamic_update_slice" in name:
            dus_us += us
        elif comp_has_dot.get(fus2comp.get(name, ""), False) or "dot" in name:
            dot_us += us
        else:
            other_us += us
    leaf_us = dot_us + dus_us + other_us
    return {
        "device_chunk_ms_per_iter": chunk_us / CHUNK / 1e3,
        "fwd_scan_ms_per_iter": inner[0] / CHUNK / 1e3 if inner else None,
        "bwd_scan_ms_per_iter": inner[1] / CHUNK / 1e3 if len(inner) > 1 else None,
        "dot_fusion_share": dot_us / leaf_us if leaf_us else None,
        "dus_save_share": dus_us / leaf_us if leaf_us else None,
        "other_share": other_us / leaf_us if leaf_us else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip M=8192")
    ap.add_argument("--only-m", type=int, default=None,
                    help="profile a single batch size")
    ap.add_argument("--bf16", action="store_true",
                    help="net hidden compute in bf16 (params/head f32)")
    ap.add_argument("--width", type=int, default=WIDTH,
                    help="hidden width (4 hidden layers)")
    ap.add_argument("--out", default=str(REPO / "results_r2" / "profile_summary.json"))
    args = ap.parse_args()
    if args.width != WIDTH:
        global LAYERS
        LAYERS = [D + 1] + [args.width] * 4 + [1]

    out: dict = {"config": {"N": N, "D": D, "layers": LAYERS, "chunk": CHUNK,
                            "bf16": args.bf16},
                 "platform": jax.devices()[0].platform,
                 "device": str(jax.devices()[0])}
    out["matmul_ceiling_tflops_bf16_4096"] = round(matmul_ceiling_tflops(), 1)

    rows = []
    Ms = [100, 512, 2048] + ([] if args.quick else [8192])
    if args.only_m is not None:
        Ms = [args.only_m]
    for M in Ms:
        iters = 2000 if M <= 512 else (1000 if M <= 2048 else 400)
        ips, trainer = time_train(M, iters, bf16=args.bf16)
        flops = per_iter_flops(M)
        tflops = ips * flops / 1e12
        row = {
            "M": M,
            "iters_per_sec": round(ips, 1),
            "path_steps_per_sec": round(ips * M * N),
            "per_iter_gflops_counted": round(flops / 1e9, 2),
            "achieved_tflops": round(tflops, 2),
            "mfu_vs_peak_197": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
            "mfu_vs_measured_ceiling": round(
                tflops / out["matmul_ceiling_tflops_bf16_4096"], 4),
            "rng_gen_us_per_iter": round(rng_gen_us_per_iter(M), 1),
        }
        row["rng_share_of_step"] = round(
            row["rng_gen_us_per_iter"] / (1e6 / ips), 4)
        if M == 2048 or args.only_m == M:
            row["trace"] = trace_breakdown(trainer, M, "/tmp/jaxtrace_profile")
        rows.append(row)
        print(json.dumps(row))
    out["sweep"] = rows

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
