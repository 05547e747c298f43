"""Global numeric configuration.

Double precision is enabled at import time: the parity path (CPU) runs the
statevector in complex128 to match the reference simulator (qulacs, which is
complex128) to ~1e-12, while TPU runs default to complex64 with explicitly
chosen dtypes everywhere.  Set ``TRLQAS_NO_X64=1`` to opt out.
"""

import os

import jax

# x64 on CPU only: the TPU path runs f32/c64 (f64 is unsupported or emulated
# on TPU backends, and stray float64 host constants would otherwise fail to
# lower).  TRLQAS_FORCE_X64=1 / TRLQAS_NO_X64=1 override in either direction.
if os.environ.get("TRLQAS_FORCE_X64"):
    jax.config.update("jax_enable_x64", True)
elif not os.environ.get("TRLQAS_NO_X64") and jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)


def default_complex_dtype():
    """complex128 on CPU (parity/oracle), complex64 on TPU (perf)."""
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend == "cpu" and jax.config.jax_enable_x64:
        return jnp.complex128
    return jnp.complex64


def default_real_dtype():
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend == "cpu" and jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32
