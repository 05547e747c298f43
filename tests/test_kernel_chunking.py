"""Env-chunked mega-kernel launches must match the single-launch result.

Per-env tapes ride SMEM scalar prefetch, so the per-launch env count is
bounded (ops/pallas_opt.py MAX_ENV_PER_CALL); oversized batches are split
into independent launches.  Each env is independent inside the kernel, so
chunked and unchunked results must agree exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.ops import pallas_opt, pallas_opt2d
from tests.test_pallas_opt2d import _setup


def _run_batch(opt, tape, arrs, x0, psi0_ri, e):
    jarrs = tuple(map(jnp.asarray, arrs))
    old_b = tuple(jnp.tile(a[None], (e, 1)) for a in jarrs)
    x0_b = np.tile(np.asarray(x0)[None], (e, 1))
    n_active_b = np.full((e,), tape.n_rots, np.int32)
    map_idx_b = np.tile(np.arange(len(x0), dtype=np.int32)[None], (e, 1))
    keys = jax.random.split(jax.random.PRNGKey(3), e)
    x, en, _ = opt.fused_step_batch(psi0_ri, old_b, x0_b, n_active_b,
                                    old_b, map_idx_b, keys)
    return np.asarray(x), np.asarray(en)


@pytest.mark.parametrize("engine,module", [("v1", pallas_opt),
                                           ("v2", pallas_opt2d)])
@pytest.mark.slow
def test_chunked_batch_matches_unchunked(engine, module, monkeypatch):
    e = 5
    _, opt, tape, arrs, x0, psi0_ri = _setup(8, 16, seed=9, iters=5,
                                             n_starts=2, engine=engine)
    x_full, e_full = _run_batch(opt, tape, arrs, x0, psi0_ri, e)
    monkeypatch.setattr(module, "MAX_ENV_PER_CALL", 2)
    x_chunk, e_chunk = _run_batch(opt, tape, arrs, x0, psi0_ri, e)
    np.testing.assert_allclose(x_chunk, x_full, atol=0)
    np.testing.assert_allclose(e_chunk, e_full, atol=0)
