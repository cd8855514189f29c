"""d=5 Bermudan max-call probe #2 (round 5): local_ema combos.

Probe #1 (results_r5/maxcall_probe.log) found the frozen-EMA-target local
objective is the lever at d=5: policy rel err 1.26% (plain local) -> 0.53%
(local_ema, M=1024, 20k). This probe tests the three obvious escalations:

  A2  local_ema, M=1024, 40k budget (2x)
  B2  local_ema, M=4096, 20k budget (4x batch)
  C2  local_ema, M=1024, 20k, ema_decay=0.995 (faster target tracking)

Each reports the policy value (fresh-path lower bound, the published
numbers' own protocol) under BOTH the EMA params and the raw params.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from dnnpde_tpu.evals import policy_value  # noqa: E402
from dnnpde_tpu.nets import build_network  # noqa: E402
from dnnpde_tpu.pde import BermudanMaxCall  # noqa: E402
from dnnpde_tpu.solver import make_net_u  # noqa: E402
from dnnpde_tpu.train import Trainer  # noqa: E402

PUB = 26.15
D, N = 5, 45
LAYERS = [D + 1, 256, 256, 256, 256, 1]


def run(tag, M, budget, decay):
    p = BermudanMaxCall(D=D, N_steps=N)
    tr = Trainer(p, M=M, N=N, layers=LAYERS, mode="FC", activation="Sine",
                 seed=0, ema_decay=decay, objective="local_ema")
    t0 = time.perf_counter()
    for iters, lr in [(budget // 2, 1e-3), (budget // 4, 1e-4),
                      (budget // 4, 1e-5)]:
        tr.train(iters, lr, log_every=2000, verbose=False)
    wall = time.perf_counter() - t0
    net_u = make_net_u(build_network("FC", LAYERS, "Sine"),
                       transform=p.transform_u)
    pv_ema = policy_value(p, net_u, tr.ema_params, N=N, n_paths=1_048_576,
                          seed=777)
    pv_raw = policy_value(p, net_u, tr.params, N=N, n_paths=1_048_576,
                          seed=777)
    y0 = float(tr.y0_log[-1])
    print(f"[{tag}] policy(EMA)={pv_ema.value:.4f}±{pv_ema.standard_error:.4f}"
          f" (rel {100 * abs(pv_ema.value - PUB) / PUB:.2f}%)  "
          f"policy(raw)={pv_raw.value:.4f} "
          f"(rel {100 * abs(pv_raw.value - PUB) / PUB:.2f}%)  "
          f"direct={y0:.4f} (rel {100 * abs(y0 - PUB) / PUB:.2f}%)  "
          f"wall {wall:.0f}s", flush=True)


if __name__ == "__main__":
    run("A2 local_ema M1024 40k d.999", 1024, 40_000, 0.999)
    run("B2 local_ema M4096 20k d.999", 4096, 20_000, 0.999)
    run("C2 local_ema M1024 20k d.995", 1024, 20_000, 0.995)
