"""Assemble BENCH_REPORT_r5.jsonl from the results_r5/*.log study outputs.

Idempotent: re-run after each study lands. Every row is self-describing
(a ``study`` key + a ``semantics`` tag) and carries its ``source`` log.
Round-5 studies print rows as ``JSONL {...}`` lines (scripts/studies_r5.py
``row()``); raw ``{...}`` lines are accepted too.

    python scripts/assemble_bench_report_r5.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "BENCH_REPORT_r5.jsonl"

LOGS = [
    "results_r5/qmc_oracle.log",
    "results_r5/max_call.log",
    "results_r5/max_call_d35.log",
    "results_r5/m2048_variance.log",
    "results_r5/serve_reconcile.log",
    "results_r5/serve_reconcile_jit.log",
    "results_r5/vega_surface.log",
    "results_r5/vega_zmatch.log",
    "results_r5/barrier_warmstart.log",
    "results_r5/barrier_read.log",
    "results_r5/barrier_m4096.log",
    "results_r5/smile_rejects.log",
    "results_r5/calibration_controls.log",
    "results_r5/calibration_net.log",
    "results_r5/calibration_net_60k.log",
]


def main() -> None:
    rows = []
    for rel in LOGS:
        p = ROOT / rel
        if not p.exists():
            continue
        for line in p.read_text().splitlines():
            line = line.strip()
            if line.startswith("JSONL "):
                line = line[len("JSONL "):]
            if not line.startswith("{"):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "study" not in row and "name" in row:
                row["study"] = row["name"]
            row.setdefault("semantics", "r5-default")
            row["source"] = rel
            rows.append(row)
    with open(OUT, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
