"""Import-time platform/x64 configuration (configx.py).

The package must be importable with ``JAX_PLATFORMS=cpu`` without ever
initializing a remote-TPU backend: an ambient platform plugin (the axon
sitecustomize on this image) overrides ``jax_platforms`` at interpreter
startup, and ``configx`` previously resolved the x64 decision through
``jax.default_backend()`` — creating the remote PJRT client at import
time, paying a network round-trip per import, and hanging forever when
the tunnel was unreachable.  These tests run real subprocesses so the
import-time code path is exercised from a cold interpreter.
"""

import os
import subprocess
import sys

import pytest

_TIMEOUT = 120  # generous vs ~5 s healthy import; far below a hung tunnel


def _run(code: str, env_extra: dict) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # drop conftest's 8-device forcing
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=_TIMEOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cpu_env_import_is_cpu_and_x64():
    """JAX_PLATFORMS=cpu must be authoritative from the first package
    import: backend resolves to cpu (no remote client touched) and the
    documented x64-on-CPU parity default engages."""
    r = _run(
        "import jax, tensorrl_qas_tpu\n"
        "print(jax.default_backend(), jax.config.jax_enable_x64)\n",
        {"JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout.split()
    assert out[-2] == "cpu" and out[-1] == "True", r.stdout


def test_no_x64_optout_respected():
    r = _run(
        "import jax, tensorrl_qas_tpu\n"
        "print(jax.config.jax_enable_x64)\n",
        {"JAX_PLATFORMS": "cpu", "TRLQAS_NO_X64": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.split()[-1] == "False", r.stdout


@pytest.mark.parametrize("knobs", [{"TRLQAS_NO_X64": "1"},
                                   {"TRLQAS_FORCE_X64": "1"}])
def test_platform_override_independent_of_x64_knobs(knobs):
    """The JAX_PLATFORMS re-application must run regardless of the x64
    opt-in/out knobs — it used to live inside the x64 decision branch and
    was silently skipped under TRLQAS_NO_X64/TRLQAS_FORCE_X64, leaving
    those imports on the plugin-forced remote platform."""
    r = _run(
        "import jax, tensorrl_qas_tpu\n"
        "print(jax.default_backend())\n",
        {"JAX_PLATFORMS": "cpu", **knobs})
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.split()[-1] == "cpu", r.stdout


def test_explicit_config_beats_env():
    """A caller's pre-import ``jax.config.update('jax_platforms', ...)``
    must survive package import even when the ambient env var says
    otherwise (scripts like generate_data.py pin cpu this way); only a
    plugin-forced default is overridable by JAX_PLATFORMS."""
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import os; os.environ['JAX_PLATFORMS'] = 'axon'\n"
        "import tensorrl_qas_tpu\n"
        "print(jax.config.jax_platforms, jax.config.jax_enable_x64)\n",
        {"JAX_PLATFORMS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.split()[-2:] == ["cpu", "True"], r.stdout


def test_import_does_not_initialize_backends():
    """Importing the package must not create any PJRT client — backend
    init is deferred to first real computation regardless of platform."""
    r = _run(
        "import jax, tensorrl_qas_tpu\n"
        "from jax._src import xla_bridge\n"
        "print('inited', xla_bridge.backends_are_initialized())\n",
        {"JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "inited False" in r.stdout, r.stdout


# The ambient plugin is injected by sitecustomize, NOT by JAX_PLATFORMS —
# autodetect in the subprocess would initialize the remote TPU client for
# real (chip contention when healthy, an indefinite hang when the tunnel
# is down).  Detect the plugin by its registration markers.
_AMBIENT_PLUGIN = any(os.environ.get(k) for k in (
    "_AXON_REGISTERED", "PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"))


@pytest.mark.skipif(
    _AMBIENT_PLUGIN or os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"),
    reason="ambient non-cpu platform plugin present; the "
           "no-env branch would initialize it for real")
def test_unset_env_falls_back_to_autodetect():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax, tensorrl_qas_tpu\n"
         "print(jax.default_backend(), jax.config.jax_enable_x64)\n"],
        capture_output=True, text=True, timeout=_TIMEOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
