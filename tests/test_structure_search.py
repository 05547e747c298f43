"""Smoke test for the direct evolutionary structure search.

Slow-gated (one env + batched optimizer compile); the tool itself is the
round-3 forensics instrument (scripts/structure_search.py) and a
standalone gradient-free architecture-search mode beyond the reference.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("TRLQAS_SLOW_TESTS"),
    reason="set TRLQAS_SLOW_TESTS=1 (compiles the batched fused step)")


def test_structure_search_smoke(tmp_path):
    out = tmp_path / "ss.json"
    r = subprocess.run(
        [sys.executable, "scripts/structure_search.py",
         "--config", "heisenberg_5q_TNbond2",
         "--pop", "8", "--gens", "4", "--max_gates", "10",
         "--global_iters", "20", "--n_starts", "2",
         "--polish_iters", "20", "--out", str(out)],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    res = json.loads(out.read_text())
    # any structure must at least stay in the physical band and improve on
    # (or match) a no-op: best_err is finite and nonnegative-definite
    assert res["best_err"] >= -1e-6
    assert res["gens"] == 4
    assert len(res["gates"]) <= 10
    assert res["depth"] >= 1
