"""CLI tests: argument parsing, problem construction, tiny end-to-end run."""

import json

import numpy as np
import pytest

from dnnpde_tpu.cli import build_parser, main, make_problem, oracle_y0


def test_parser_defaults():
    args = build_parser().parse_args([])
    assert args.problem == "bsb" and args.M == 100 and args.N == 50
    assert args.iters == [2000, 500] and args.lrs == [1e-3, 1e-5]


def test_parser_rejects_unknown_problem():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--problem", "navier-stokes"])


@pytest.mark.parametrize("name,dim", [
    ("bsb", 10), ("call1d", 1), ("callnd", 5), ("basket", 5),
    ("testcase", 5), ("hjb", 5), ("heston", 2),
])
def test_make_problem(name, dim):
    args = build_parser().parse_args(["--problem", name, "--D", str(dim)])
    p = make_problem(args)
    assert p.dim == (2 if name == "heston" else dim)


def test_heston_cli_flags():
    """--heston-diffusion / --heston-output map onto HestonPDE fields
    (round-4 defaults: cholesky + bs control-variate head; round-3 plain
    and reference parity both reachable)."""
    args = build_parser().parse_args(["--problem", "heston"])
    p = make_problem(args)
    assert p.diffusion == "cholesky"
    assert p.clamp_output and p.clamp_smoothing == "bs"

    args = build_parser().parse_args(
        ["--problem", "heston", "--heston-output", "plain"]
    )
    p = make_problem(args)
    assert not p.clamp_output  # round-3 plain output

    args = build_parser().parse_args([
        "--problem", "heston", "--heston-diffusion", "reference",
        "--heston-output", "hard",
    ])
    p = make_problem(args)
    assert p.diffusion == "reference"
    assert p.clamp_output and p.clamp_smoothing == "hard"

    args = build_parser().parse_args([
        "--problem", "heston", "--heston-output", "anchor",
    ])
    p = make_problem(args)
    assert p.clamp_output and p.clamp_mode == "anchor"


def test_oracle_available_for_every_problem():
    for name in ("bsb", "call1d", "basket", "hjb", "heston"):
        args = build_parser().parse_args(["--problem", name, "--D", "3"])
        val = oracle_y0(make_problem(args), args)
        assert val is not None and np.isfinite(val), name


@pytest.mark.slow  # test_cli_antithetic_and_ema_flags still trains end-to-end in the fast tier
def test_cli_end_to_end(tmp_path):
    rc = main([
        "--problem", "call1d", "--D", "1", "--M", "8", "--N", "3",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--checkpoint", str(tmp_path / "m.bin"),
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert np.isfinite(summary["learned_y0"])
    assert summary["rel_error"] is not None
    assert (tmp_path / "m.bin").exists()
    assert any(f.suffix == ".png" for f in tmp_path.iterdir())


def test_cli_export_serving_artifact(tmp_path):
    """--export writes a loadable StableHLO artifact of the trained solution."""
    art = tmp_path / "sol.stablehlo"
    rc = main([
        "--problem", "call1d", "--D", "1", "--M", "8", "--N", "3",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--export", str(art),
    ])
    assert rc == 0 and art.exists()
    from dnnpde_tpu.serve import load_solution

    sol = load_solution(str(art))
    u, Z = sol.u_and_grad(0.0, np.ones((3, 1)))
    assert u.shape == (3, 1) and Z.shape == (3, 1)
    assert np.isfinite(u).all() and np.isfinite(Z).all()


def test_cli_compute_dtype_flag(tmp_path):
    """--compute-dtype bfloat16 threads through to the net (params stay f32)."""
    rc = main([
        "--problem", "call1d", "--D", "1", "--M", "8", "--N", "3",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--compute-dtype", "bfloat16",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert np.isfinite(summary["learned_y0"])


def test_cli_antithetic_and_ema_flags(tmp_path):
    rc = main([
        "--problem", "call1d", "--D", "1", "--M", "8", "--N", "3",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--antithetic", "--ema-decay", "0.99",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert np.isfinite(summary["learned_y0"])
    assert summary["ema_y0"] is not None and np.isfinite(summary["ema_y0"])


def test_cli_american_put(tmp_path):
    """--problem american_put: the parser-default 'global' objective
    auto-resolves to 'local' (optimal stopping needs reflected targets),
    the Bermudan-N tree oracle is reported, and the run completes."""
    rc = main([
        "--problem", "american_put", "--D", "1", "--M", "8", "--N", "4",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert np.isfinite(summary["learned_y0"])
    # Bermudan-4 CRR value for the default contract (K=1, r=0.06, σ=0.2)
    assert summary["oracle_y0"] == pytest.approx(0.0567, abs=0.002)


def test_cli_barrier_call(tmp_path):
    """--problem barrier_call: objective auto-resolves to local (the value
    jumps at knockout dates), the oracle is the exact discrete chain."""
    rc = main([
        "--problem", "barrier_call", "--M", "8", "--N", "4",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert np.isfinite(summary["learned_y0"])
    assert 0.0 < summary["oracle_y0"] < 0.1  # knocked-out call ≪ vanilla


def test_cli_surface_mode(tmp_path):
    """--surface runs the packaged Heston surface protocol: parser-default
    flags resolve to the recipe (objective=local etc.), explicit flags
    override, and the smile/greeks CSV + summary JSON land in --out."""
    import os

    from dnnpde_tpu.cli import _surface_main, build_parser

    args = build_parser().parse_args([
        "--problem", "heston", "--surface", "--M", "8", "--N", "4",
        "--width", "16", "--depth", "2", "--iters", "4", "4",
        "--seed", "0", "--out", str(tmp_path), "--quiet",
    ])
    rc = _surface_main(args)
    assert rc in (0, 1)  # gate flag propagates to the exit code
    assert os.path.exists(tmp_path / "results_heston_surface.csv")
    assert os.path.exists(tmp_path / "HestonSurface_iv_smile.png")


def test_cli_surface_requires_heston():
    from dnnpde_tpu.cli import _surface_main, build_parser

    args = build_parser().parse_args(["--problem", "bsb", "--surface"])
    with pytest.raises(SystemExit):
        _surface_main(args)


def test_cli_surface_recipe_resolution():
    """Flags at parser defaults resolve to SurfaceConfig recipe values;
    explicit flags win."""
    from dnnpde_tpu.cli import _SURFACE_RESOLVED, build_parser

    defaults = build_parser().parse_args([])
    for name, value in _SURFACE_RESOLVED.items():
        assert getattr(defaults, name) == value, name


def test_scaled_lr_rule():
    """lr ~ 1/width, anchored at (256, 1e-3) — the measured fix for the
    width-1024 regression (results_r4/dim1000_lr_width.log)."""
    from dnnpde_tpu.train import scaled_lr

    assert scaled_lr(256) == pytest.approx(1e-3)
    assert scaled_lr(512) == pytest.approx(5e-4)
    assert scaled_lr(1024) == pytest.approx(2.5e-4)
    assert scaled_lr(1024, base_lr=2e-3) == pytest.approx(5e-4)


def test_cli_cv_price(tmp_path):
    """--cv-price PATHS attaches the neural-CV MC block to the summary:
    value/SE plus the measured variance-reduction factor on PATHS paths."""
    rc = main([
        "--problem", "call1d", "--D", "1", "--M", "8", "--N", "3",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--cv-price", "4096",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    cv = summary["cv_price"]
    assert cv["n_paths"] == 4096
    assert np.isfinite(cv["value"]) and cv["standard_error"] > 0
    # untrained-scale net: still exactly unbiased, VRF just ~1
    assert abs(cv["value"] - summary["oracle_y0"]) < 10 * (
        cv["standard_error"] + cv["plain_standard_error"]
    )


def test_cli_cv_price_nonlinear_driver_reports_error(tmp_path):
    """bsb's driver is Z-coupled — --cv-price must surface the reason in
    the summary instead of crashing after the training already ran."""
    rc = main([
        "--problem", "bsb", "--D", "4", "--M", "8", "--N", "3",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--cv-price", "1024",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert "error" in summary["cv_price"]


def test_cli_heston_american_put(tmp_path):
    """--problem heston_american_put: objective auto-resolves to local
    (early exercise), oracle is the LSMC policy value on the exact chain."""
    rc = main([
        "--problem", "heston_american_put", "--M", "8", "--N", "4",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert np.isfinite(summary["learned_y0"])
    # ATM Heston put at v0=0.2: European ~0.15, premium on top
    assert 0.12 < summary["oracle_y0"] < 0.22


def test_cli_cv_price_american_routes_to_lsmc(tmp_path):
    """--cv-price on an early-exercise problem must price the STOPPED
    process (CV-boosted LSMC), not the European telescoped value."""
    rc = main([
        "--problem", "american_put", "--M", "8", "--N", "4",
        "--width", "8", "--depth", "2", "--iters", "4", "2",
        "--out", str(tmp_path), "--quiet", "--log-every", "4",
        "--cv-price", "8192",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    cv = summary["cv_price"]
    assert cv["estimator"] == "cv_lsmc"
    # the Bermudan value, not the European one: compare vs the tree oracle
    assert abs(cv["value"] - summary["oracle_y0"]) / summary["oracle_y0"] < 0.05
