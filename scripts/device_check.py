"""Device availability smoke check (parity with the reference's
``ref_sample.py:1-2`` which prints ``torch.cuda.is_available()``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if __name__ == "__main__":
    print("backend:", jax.default_backend())
    print("devices:", jax.devices())
    print("device count:", jax.device_count())
