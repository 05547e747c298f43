"""On-TPU validation of the mega-kernel's in-kernel depolarizing PRNG.

Runs the statistical Kraus-parity check that the CPU suite must skip
(the Mosaic interpreter stubs prng_random_bits to zeros).  Invoked
directly — NOT via pytest — so the repo conftest doesn't force the CPU
platform:

    python scripts/validate_inkernel_noise.py
"""

import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

if __name__ == "__main__":
    import jax

    from tensorrl_qas_tpu.utils.compcache import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS before backend lookup
    if jax.default_backend() == "cpu":
        print("ERROR: no TPU backend available", file=sys.stderr)
        sys.exit(1)
    from test_noise_pallas import (
        test_mega_kernel_inkernel_noise_matches_kraus as check,
    )

    check()
    print("in-kernel noise Kraus parity: OK")
