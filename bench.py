"""Benchmark harness: 100D Black–Scholes–Barenblatt deep-BSDE training throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference baseline (BASELINE.md): M=100 paths, N=50 steps,
D=100, FC-Sine [101, 256×4, 1], Adam @ 1e-3 — the ``DeepBSDE.py:430-448``
setup. ``vs_baseline`` compares against a freshly measured torch-CPU
re-implementation of the reference's per-iteration work (host-side NumPy
minibatch + Python time loop + autograd Z per step), i.e. the reference's
own algorithmic structure on the hardware available here — the reference
publishes no numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

M, N, D = 100, 50, 100
# One chunk = one jitted scan = one dispatch + one host read. Through the
# axon tunnel a blocking read costs ~42 ms, so long chunks keep the
# measurement about the device, not the tunnel (3 chunks ≈ 4% overhead).
CHUNK = 1000
BENCH_ITERS = 3000
TORCH_WARMUP_ITERS = 3
TORCH_BASELINE_ITERS = 20


def bench_tpu(batch: int = M, iters: int = BENCH_ITERS, chunk: int = CHUNK,
              net_kwargs: dict | None = None) -> float:
    """Our framework: iterations/sec for the full jitted train step."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    problem = BlackScholesBarenblatt(D=D, T=1.0)
    trainer = Trainer(
        problem, M=batch, N=N, layers=[D + 1, 256, 256, 256, 256, 1],
        mode="FC", activation="Sine", seed=0, net_kwargs=net_kwargs,
    )
    # Warmup: compile the chunked training scan. The chunk program is keyed
    # on its length, so warm up with the SAME log_every used for timing.
    trainer.train(chunk, 1e-3, "Adam", log_every=chunk, verbose=False)
    jax.block_until_ready(trainer.params)
    t0 = time.perf_counter()
    res = trainer.train(iters, 1e-3, "Adam", log_every=chunk, verbose=False)
    _ = float(res.graph[1][-1])  # host read — reliable sync through the tunnel
    dt = time.perf_counter() - t0
    return iters / dt


def bench_torch_reference_style() -> float:
    """Reference-style torch implementation (fresh, minimal): host-NumPy
    minibatch, Python time loop, autograd.grad per step, Adam. Measures the
    algorithmic structure the reference uses (``1d_BSPDE_case.py:246-416``)."""
    import torch

    torch.manual_seed(0)
    dev = torch.device("cuda:0" if torch.cuda.is_available() else "cpu")
    layers = [D + 1, 256, 256, 256, 256, 1]

    class SineNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.hidden = torch.nn.ModuleList(
                [torch.nn.Linear(layers[i], layers[i + 1]) for i in range(len(layers) - 2)]
            )
            self.out = torch.nn.Linear(layers[-2], layers[-1])

        def forward(self, x):
            for h in self.hidden:
                x = torch.sin(h(x))
            return self.out(x)

    model = SineNet().to(dev)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    T, r, sb = 1.0, 0.05, 0.4
    x0 = np.tile([1.0, 0.5], D // 2).astype(np.float32)
    dt = T / N

    def net_u(t, X):
        u = model(torch.cat([t, X], dim=1))
        Z = torch.autograd.grad(u.sum(), X, create_graph=True)[0]
        return u, Z

    times = []
    for i in range(TORCH_WARMUP_ITERS + TORCH_BASELINE_ITERS):
        tic = time.perf_counter()
        dW = (np.sqrt(dt) * np.random.normal(size=(M, N, D))).astype(np.float32)
        dW_t = torch.from_numpy(dW).to(dev)
        X = torch.from_numpy(np.broadcast_to(x0, (M, D)).copy()).to(dev)
        X.requires_grad_(True)
        t = torch.zeros((M, 1), device=dev)
        Y, Z = net_u(t, X)
        loss = 0.0
        for n in range(N):
            sdw = sb * X * dW_t[:, n, :]
            X1 = (X + sdw).detach().requires_grad_(True)
            phi = r * (Y - (X * Z).sum(1, keepdim=True))
            Y_tilde = Y + phi * dt + (Z * sdw).sum(1, keepdim=True)
            t = t + dt
            Y, Z = net_u(t, X1)
            loss = loss + ((Y - Y_tilde) ** 2).sum()
            X = X1
        g = (X**2).sum(1, keepdim=True)
        loss = loss + ((Y - g) ** 2).sum()
        Dg = torch.autograd.grad(g.sum(), X, create_graph=True)[0]
        loss = loss + ((Z - Dg) ** 2).sum()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if i >= TORCH_WARMUP_ITERS:  # exclude allocator/autograd warmup
            times.append(time.perf_counter() - tic)
    return 1.0 / float(np.median(times))


def main() -> None:
    ours = bench_tpu()
    # Large-batch throughput rows (driver-visible): the v5e keeps scaling
    # path-steps/s well past the reference's M=100 config.
    extra = {}
    ips = bench_tpu(batch=512, iters=1000, chunk=1000)
    extra["m512_iters_per_sec"] = round(ips, 1)
    extra["m512_path_steps_per_sec"] = round(ips * 512 * N)
    # m2048 f32: MEDIAN of 3 runs. The round-5 variance study
    # (results_r5/m2048_variance.log) measured the in-session spread at
    # 0.1-0.3% around 91.6-92.3 it/s (9.38-9.45M path-steps/s) across
    # isolated, driver-order-replicated and long-window protocols — the
    # round-4 driver row (86.0 it/s) was not reproducible under any of
    # them and is attributed to driver-time environment variance (the
    # tunneled runtime), not the protocol; the median-of-3 here bounds
    # the damage a single slow window can do to the number of record.
    runs = [bench_tpu(batch=2048, iters=500, chunk=500) for _ in range(3)]
    ips = sorted(runs)[1]
    extra["m2048_iters_per_sec"] = round(ips, 1)
    extra["m2048_path_steps_per_sec"] = round(ips * 2048 * N)
    extra["m2048_runs_iters_per_sec"] = [round(r, 1) for r in runs]
    # Best-known large-batch config and the DOCUMENTED large-M
    # recommendation: bf16 hidden compute (accuracy held at the canonical
    # budget — BENCH_REPORT_r2.jsonl "mixed_precision"; round-5 median
    # 102.1 it/s = 10.46M path-steps/s, +11% over f32, spread 0.1%).
    ips = bench_tpu(batch=2048, iters=500, chunk=500,
                    net_kwargs={"compute_dtype": "bfloat16"})
    extra["m2048_bf16_iters_per_sec"] = round(ips, 1)
    extra["m2048_bf16_path_steps_per_sec"] = round(ips * 2048 * N)
    try:
        baseline = bench_torch_reference_style()
    except Exception:
        baseline = float("nan")
    vs = ours / baseline if baseline == baseline else float("nan")
    print(
        json.dumps(
            {
                "metric": "bsb100d_train_iters_per_sec",
                "value": round(ours, 3),
                "unit": "iters/s (M=100,N=50,D=100 FC-Sine deep-BSDE step)",
                "vs_baseline": round(vs, 2) if vs == vs else None,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
