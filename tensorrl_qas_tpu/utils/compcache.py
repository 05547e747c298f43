"""Persistent XLA compilation cache.

The fused training step takes tens of seconds to compile cold (143 s at
12 qubits measured in round 2); every driver/bench invocation paid it
again.  Enabling JAX's persistent compilation cache amortizes that across
process launches — subsequent runs of the same shapes deserialize the
executable instead of recompiling.

Safe to call multiple times; silently degrades to no-op if the backend
cannot serialize executables (the cache is best-effort by design).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative (entry-point semantics).

    The ambient environment may pre-register a TPU platform plugin that
    forces ``jax_platforms`` regardless of the env var (see root
    conftest.py); re-apply the user's choice after import so
    ``JAX_PLATFORMS=cpu python -m tensorrl_qas_tpu.train.cli ...`` really
    runs on host CPU.

    Precedence contract (three related mechanisms, by design):
      - ``configx._configured_platform`` runs at package import and is
        the conservative layer: env var beats a *plugin-forced* default
        but never an explicit in-process ``jax.config.update``.
      - THIS helper is for process entry points (cli, bench, scripts)
        where the env var is the user's expressed intent for the whole
        process: it stomps whatever is configured, unconditionally.
      - The test conftest pins cpu before any package import.
    Call this only from ``__main__``-level code, never from library
    modules — a library import must not override a host application's
    platform choice.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:  # noqa: BLE001
            pass


def _host_fingerprint() -> str:
    """Stable short fingerprint of this host's CPU feature set.

    XLA:CPU persists AOT-compiled executables; deserializing an entry
    compiled on a host with different CPU features emits a wall of
    ``cpu_aot_loader.cc`` errors and "could lead to SIGILL" warnings
    (this poisoned the round-3 bench — BENCH_r03.json tail).  Keying the
    cache directory by machine type + CPU flags keeps entries from
    different hosts in different directories.
    """
    import hashlib
    import platform as _platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha256(
        (_platform.machine() + "|" + feats).encode()).hexdigest()[:10]
    return digest


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache directory.

    The directory is keyed by the configured platform and a host CPU
    fingerprint so entries never cross incompatible hosts/backends.
    Returns the cache dir actually configured, or None on failure.
    Override location with ``TRLQAS_CACHE_DIR`` (used verbatim — no
    keying); set it to ``off`` to disable entirely.
    """
    env = os.environ.get("TRLQAS_CACHE_DIR")
    if env == "off":
        return None
    if path is None and env is None:
        # platform label WITHOUT initializing the backend (a hung TPU
        # tunnel must not be able to wedge cache setup)
        plat = os.environ.get("JAX_PLATFORMS") or "auto"
        try:
            import jax

            plat = jax.config.jax_platforms or plat
        except Exception:  # noqa: BLE001
            pass
        plat = plat.split(",")[0].strip() or "auto"
        if plat == "cpu":
            # XLA:CPU's AOT executable serialization is self-incompatible
            # on this host: an entry written by one process fails the
            # loader's target-feature check (``+prefer-no-gather``/
            # ``+prefer-no-scatter`` are stamped as target features but
            # never reported as host features) in the NEXT process, with
            # "could lead to SIGILL" warnings (round-3 bench tail).  The
            # CPU path is only a fallback/test tier here — skip the
            # persistent cache rather than risk executing mismatched AOT
            # code.  Opt back in explicitly via TRLQAS_CACHE_DIR.
            return None
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "trlqas_xla",
            f"{plat}-{_host_fingerprint()}")
    path = path or env
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min-compile-time threshold is 1s; our fused steps are
        # far above it, but keep small entries too — the driver also jits
        # many sub-second helpers that add up across launches.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:  # noqa: BLE001 — best-effort cache
        return None
