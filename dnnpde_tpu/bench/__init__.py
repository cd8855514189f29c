"""Tolerance-gated benchmark harness (the BASELINE.md configs)."""

from dnnpde_tpu.bench.harness import (
    ALL_BENCHES,
    BenchRow,
    bench_basket_100d,
    bench_bsb_100d,
    bench_call_1d,
    bench_heston,
    bench_hjb_100d,
    run_all,
)

__all__ = [
    "ALL_BENCHES",
    "BenchRow",
    "bench_bsb_100d",
    "bench_call_1d",
    "bench_basket_100d",
    "bench_hjb_100d",
    "bench_heston",
    "run_all",
]
