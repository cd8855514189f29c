"""Results reporting: sweep rows → pandas DataFrame → CSV.

Parity with the reference's results CSVs (``results.csv`` /
``results_corr.csv`` / ``results_nbs.csv``) and their column sets:
batch/dims/lr/iters/optimizer/mode/activation + Mean Error / Std Error /
RMSE / Min Loss / Exact vs Learned price / Total Run Time / Spectral Radius
(``with_corr_high_dimension_pde.py:1122-1125``, ``nd_BSPDE_case.py:765-766``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import pandas as pd

RESULT_COLUMNS = [
    "Batch Size",
    "Dimensions",
    "Initial LR",
    "Fine Tuning LR",
    "Initial Iters",
    "Fine Tuning Iters",
    "Optimizer",
    "Mode",
    "Activation",
    "Correlation",
    "Mean Error",
    "Std Error",
    "RMSE",
    "Min Loss",
    "Exact Price",
    "Oracle SE",
    "Learned Price",
    "Relative Error",
    "Quality Flag",
    "Mean Spectral Radius",
    "Total Run Time",
]


def quality_row(
    learned: float,
    oracle: float,
    rel_threshold: float = 0.02,
    degenerate: bool = False,
) -> dict[str, Any]:
    """Shared run-quality columns for every executor (VERDICT r2 #2): the
    relative error vs the oracle the row already computes, plus a flag so a
    reader can never silently average a bad row into conclusions.

    Flags: "ok" (rel ≤ threshold), "off_oracle" (trained but far from the
    oracle — e.g. the round-1 NAIS-Net ReLU D=100 basket row at 62%), or
    "degenerate" (pinned/collapsed trajectory, caller-detected)."""
    import math

    rel = abs(learned - oracle) / max(abs(oracle), 1e-12)
    if degenerate or not math.isfinite(rel):
        flag = "degenerate"
    elif rel <= rel_threshold:
        flag = "ok"
    else:
        flag = "off_oracle"
    return {"Relative Error": rel, "Quality Flag": flag}


@dataclasses.dataclass
class ResultsReport:
    """Accumulates one row per sweep configuration; writes CSV."""

    columns: Optional[list[str]] = None

    def __post_init__(self):
        self.rows: list[dict[str, Any]] = []

    def add_row(self, **kwargs: Any) -> None:
        self.rows.append(kwargs)

    def to_dataframe(self) -> pd.DataFrame:
        df = pd.DataFrame(self.rows)
        if self.columns:
            for c in self.columns:
                if c not in df.columns:
                    df[c] = None
            df = df[self.columns + [c for c in df.columns if c not in self.columns]]
        return df

    def to_csv(self, path: str) -> str:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        self.to_dataframe().to_csv(path, index=False)
        return path
