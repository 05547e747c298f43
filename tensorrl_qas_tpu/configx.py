"""Global numeric configuration.

Double precision is enabled at import time: the parity path (CPU) runs the
statevector in complex128 to match the reference simulator (qulacs, which is
complex128) to ~1e-12, while TPU runs default to complex64 with explicitly
chosen dtypes everywhere.  Set ``TRLQAS_NO_X64=1`` to opt out.
"""

import os

import jax


def _configured_platform() -> str | None:
    """Primary platform from env/config WITHOUT initializing a backend.

    Two reasons not to call ``jax.default_backend()`` here: (1) this runs
    at package-import time, and creating a remote-TPU PJRT client then
    means every ``import tensorrl_qas_tpu`` pays (or, with a dead tunnel,
    hangs on) a network round-trip; (2) an ambient platform plugin may
    have overridden ``jax_platforms`` at interpreter startup, so the
    user's ``JAX_PLATFORMS`` env choice must be re-applied *before* the
    first backend lookup or it is silently ignored (the root conftest and
    ``utils.compcache.apply_platform_env`` do the same, but only for
    callers that go through them).
    """
    cfg_plat = getattr(jax.config, "jax_platforms", None) or ""
    env_plat = os.environ.get("JAX_PLATFORMS") or ""
    primary = cfg_plat.split(",")[0].strip().lower()
    # Re-apply the env var ONLY over a plugin-forced default ("axon" is
    # this image's remote-TPU plugin; plain jax honors the env var itself
    # so cfg already matches env).  A caller's explicit pre-import
    # ``jax.config.update("jax_platforms", ...)`` must win over the env —
    # e.g. scripts/generate_data.py pins cpu while the ambient env says
    # axon; stomping that would re-introduce the remote client here.
    if env_plat and env_plat != cfg_plat and primary in ("", "axon"):
        try:
            jax.config.update("jax_platforms", env_plat)
            primary = env_plat.split(",")[0].strip().lower()
        except Exception:  # noqa: BLE001 — unknown platform string
            pass
    return primary or None


# The platform resolution must run unconditionally at import — it is what
# makes JAX_PLATFORMS=cpu effective over a plugin-forced default for every
# consumer, not just the x64 decision below (skipping it under the x64
# opt-out knobs would silently leave imports on the remote platform).
_plat = _configured_platform()

# x64 on CPU only: the TPU path runs f32/c64 (f64 is unsupported or emulated
# on TPU backends, and stray float64 host constants would otherwise fail to
# lower).  TRLQAS_FORCE_X64=1 / TRLQAS_NO_X64=1 override in either direction.
if os.environ.get("TRLQAS_FORCE_X64"):
    jax.config.update("jax_enable_x64", True)
elif not os.environ.get("TRLQAS_NO_X64"):
    # only fall back to initializing the default backend when no platform
    # is configured anywhere (plain-CPU jax installs autodetect here)
    if (_plat or jax.default_backend()) == "cpu":
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
