"""Bench-harness API tests (tiny budgets, CPU backend)."""

import numpy as np

from dnnpde_tpu.bench import bench_bsb_100d, bench_call_1d
from dnnpde_tpu.bench.harness import _run
from dnnpde_tpu.pde import BlackScholesBarenblatt
import pytest


@pytest.mark.slow  # full-budget harness integration; results_r4/harness.log evidences
def test_run_accepts_phase_lists():
    p = BlackScholesBarenblatt(D=3)
    row = _run(
        "tiny", p, 1.0, M=8, N=3, phases=((4, 1e-3), (2, 1e-4), (2, 1e-5)),
        layers=[4, 8, 8, 1],
    )
    assert row.config["phases"] == [[4, 1e-3], [2, 1e-4], [2, 1e-5]]
    assert np.isfinite(row.learned_y0)
    assert row.iters_per_sec > 0


@pytest.mark.slow
def test_run_legacy_two_phase_form():
    p = BlackScholesBarenblatt(D=3)
    row = _run(
        "tiny", p, 1.0, M=8, N=3, iters=(4, 2), lrs=(1e-3, 1e-5),
        layers=[4, 8, 8, 1],
    )
    assert row.config["phases"] == [[4, 1e-3], [2, 1e-5]]


def test_bench_defaults_are_config_only():
    """bench_call_1d's canonical default must be the four-phase anneal; the
    two-phase override must pass through (no training here — config check
    via the documented phases)."""
    import inspect

    src = inspect.getsource(bench_call_1d)
    assert "5000, 1e-3" in src and "5000, 1e-6" in src
    assert bench_bsb_100d.__defaults__[0] is None  # iters=None -> own default


def test_run_ema_headline():
    """_run(ema_decay=...) headlines the EMA-shadow Y0 and keeps the raw
    tail in the config (the r3 measured-best protocol defaults)."""
    p = BlackScholesBarenblatt(D=3)
    row = _run(
        "tiny-ema", p, 1.0, M=8, N=3, phases=((6, 1e-3),),
        layers=[4, 8, 8, 1], ema_decay=0.5,
    )
    assert row.config["ema_decay"] == 0.5
    assert np.isfinite(row.config["raw_tail_y0"])
    assert np.isfinite(row.learned_y0)


def test_bench_heston_default_protocol():
    """The heston row's default protocol is the round-3 measured-best:
    corrected (default) HestonPDE + single-resolution N=50 anneal with the
    EMA read (the discrete-BSDE oracle showed the N=50 scheme bias is only
    +0.26%, so the interim Richardson pass is gone) — config check, no
    training."""
    import inspect

    from dnnpde_tpu.bench import bench_heston

    src = inspect.getsource(bench_heston)
    assert "ema_decay=0.999" in src and "N=50" in src
    # the Richardson import/call is gone (it survives only as a mention in
    # the docstring and as the general train.richardson_y0 capability)
    assert "import richardson_y0" not in src and "richardson_y0(" not in src
