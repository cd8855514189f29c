"""Assemble BENCH_REPORT_r3.jsonl from the results_r3/*.log study outputs
plus hand-written summary rows. Idempotent: re-run after each study lands.

    python scripts/assemble_bench_report.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "BENCH_REPORT_r3.jsonl"

LOGS = [
    "results_r3/heston_matrix_v2.log",
    "results_r3/heston_diag.log",
    "results_r3/collapse_guard.log",
    "results_r3/rollout_kernel.log",
    "results_r3/dim1000.log",
    "results_r3/dim1000_m512.log",
    "results_r3/dim1000_50k.log",
    "results_r3/basket_matrix.log",
    "results_r3/basket_d10_diag.log",
    "results_r3/heston_n100_budget.log",
    "results_r3/heston_discrete_value.log",
    "results_r3/heston_output_modes.log",
    "results_r3/heston_default_matrix.log",
    "results_r3/heston_converged.log",
    "results_r3/seed_robustness.log",
    "results_r3/heston_trained_greeks.log",
    "results_r3/scan_unroll.log",
    "results_r3/heston_regimes.log",
    "results_r3/heston_iv_smile.log",
    "results_r3/heston_bs_point.log",
    "results_r3/heston_bs_mode.log",
    "results_r3/harness.log",
]


def main() -> None:
    rows = []
    for rel in LOGS:
        p = ROOT / rel
        if not p.exists():
            continue
        for line in p.read_text().splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    # de-dup exact repeats (idempotent re-assembly)
    seen, uniq = set(), []
    for r in rows:
        k = json.dumps(r, sort_keys=True)
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    with open(OUT, "w") as f:
        for r in uniq:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(uniq)} rows -> {OUT}")


if __name__ == "__main__":
    main()
