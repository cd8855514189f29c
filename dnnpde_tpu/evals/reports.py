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
    "Learned Price",
    "Mean Spectral Radius",
    "Total Run Time",
]


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
