"""Assemble BENCH_REPORT_r4.jsonl from the results_r4/*.log study outputs.

Idempotent: re-run after each study lands. Every row is normalized to be
self-describing (VERDICT r3 weak #8): a ``study`` key (copied from ``name``
when a source emitted only that) and a ``semantics`` tag ("r4-default" for
rows measured at the framework's current shipping defaults,
"lever-shootout"/"legacy-control" for deliberate non-default rows).

    python scripts/assemble_bench_report_r4.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "BENCH_REPORT_r4.jsonl"

LOGS = [
    "results_r4/throughput_levers.log",
    "results_r4/base_rerun.log",
    "results_r4/smile_objectives.log",
    "results_r4/smile_winner_bigcfg.log",
    "results_r4/greeks_local.log",
    "results_r4/combo_matrix.log",
    "results_r4/greeks_combo.log",
    "results_r4/bs_anchor_matrix.log",
    "results_r4/replica_matrix.log",
    "results_r4/dim1000_lr_width.log",
    "results_r4/basket_relu_median.log",
    "results_r4/bigcfg_local_bs.log",
    "results_r4/polish_gate.log",
    "results_r4/surface_executor.log",
    "results_r4/calibration_roundtrip.log",
    "results_r4/american_put.log",
    "results_r4/american_put_head.log",
    "results_r4/american_surface.log",
    "results_r4/serve_bench.log",
    "results_r4/barrier_call.log",
    "results_r4/asian_lookback.log",
    "results_r4/neural_cv.log",
    "results_r4/heston_american.log",
    "results_r4/heston_american_surface.log",
    "results_r4/pipeline_throughput.log",
    "results_r4/harness.log",
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
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "study" not in row and "name" in row:
                row["study"] = row["name"]
            row.setdefault("semantics", "r4-default")
            row["source"] = rel
            rows.append(row)
    with open(OUT, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
