"""ctypes bindings for the csim native statevector engine.

Builds libcsim.so on first use (g++, cached next to the source); degrades
gracefully (``available() -> False``) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "csim.cpp"
_LIB = _DIR / "libcsim.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    lib = ctypes.CDLL(str(_LIB))
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.csim_apply_tape.argtypes = [ctypes.c_int32, i32p, i32p, i32p, i32p,
                                    ctypes.c_int32, f64p, f64p]
    lib.csim_apply_tape.restype = None
    lib.csim_pauli_expectation.argtypes = [ctypes.c_int32, f64p,
                                           ctypes.c_int32, u32p, u32p, i32p,
                                           f64p]
    lib.csim_pauli_expectation.restype = ctypes.c_double
    lib.csim_tape_energy.argtypes = [ctypes.c_int32, i32p, i32p, i32p, i32p,
                                     ctypes.c_int32, f64p, f64p,
                                     ctypes.c_int32, u32p, u32p, i32p, f64p,
                                     f64p]
    lib.csim_tape_energy.restype = ctypes.c_double
    lib.csim_apply_tape_depolarizing.argtypes = [
        ctypes.c_int32, i32p, i32p, i32p, i32p, ctypes.c_int32, f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_uint64, f64p]
    lib.csim_apply_tape_depolarizing.restype = None
    lib.csim_tape_energy_depolarizing.argtypes = [
        ctypes.c_int32, i32p, i32p, i32p, i32p, ctypes.c_int32, f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_uint64, f64p,
        ctypes.c_int32, u32p, u32p, i32p, f64p, f64p]
    lib.csim_tape_energy_depolarizing.restype = ctypes.c_double
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class CsimEngine:
    """Host statevector engine bound to one PauliSum."""

    def __init__(self, pauli):
        lib = _load()
        if lib is None:
            raise RuntimeError("csim native library unavailable (no g++?)")
        self._lib = lib
        self.n = pauli.n_qubits
        self.flip = np.ascontiguousarray(pauli.flip, dtype=np.uint32)
        self.sign = np.ascontiguousarray(pauli.sign_mask, dtype=np.uint32)
        # (-i)^ny: recover ny mod 4 from the stored phase
        ph = np.asarray(pauli.iphase)
        ny = np.zeros(len(ph), dtype=np.int32)
        ny[np.isclose(ph, -1j)] = 1
        ny[np.isclose(ph, -1)] = 2
        ny[np.isclose(ph, 1j)] = 3
        self.ny = np.ascontiguousarray(ny)
        self.w = np.ascontiguousarray(pauli.weights, dtype=np.float64)
        self._scratch = np.zeros(2 * (1 << self.n), dtype=np.float64)

    def apply_tape(self, psi: np.ndarray, kind, tq, cq, slot,
                   angles) -> np.ndarray:
        """psi: (2^n,) complex128 -> evolved copy."""
        state = np.ascontiguousarray(
            psi.astype(np.complex128).view(np.float64))
        kind = np.ascontiguousarray(kind, dtype=np.int32)
        tq = np.ascontiguousarray(tq, dtype=np.int32)
        cq = np.ascontiguousarray(cq, dtype=np.int32)
        slot = np.ascontiguousarray(slot, dtype=np.int32)
        angles = np.ascontiguousarray(angles, dtype=np.float64)
        self._lib.csim_apply_tape(
            self.n, _ptr(kind, ctypes.c_int32), _ptr(tq, ctypes.c_int32),
            _ptr(cq, ctypes.c_int32), _ptr(slot, ctypes.c_int32),
            len(kind), _ptr(angles, ctypes.c_double),
            _ptr(state, ctypes.c_double))
        return state.view(np.complex128)

    def expectation(self, psi: np.ndarray) -> float:
        state = np.ascontiguousarray(
            psi.astype(np.complex128).view(np.float64))
        return float(self._lib.csim_pauli_expectation(
            self.n, _ptr(state, ctypes.c_double), len(self.w),
            _ptr(self.flip, ctypes.c_uint32), _ptr(self.sign, ctypes.c_uint32),
            _ptr(self.ny, ctypes.c_int32), _ptr(self.w, ctypes.c_double)))

    def tape_energy(self, psi0: np.ndarray, kind, tq, cq, slot,
                    angles) -> float:
        """Fused apply+expectation (the COBYLA inner-loop evaluation)."""
        p0 = np.ascontiguousarray(psi0.astype(np.complex128).view(np.float64))
        kind = np.ascontiguousarray(kind, dtype=np.int32)
        tq = np.ascontiguousarray(tq, dtype=np.int32)
        cq = np.ascontiguousarray(cq, dtype=np.int32)
        slot = np.ascontiguousarray(slot, dtype=np.int32)
        angles = np.ascontiguousarray(angles, dtype=np.float64)
        return float(self._lib.csim_tape_energy(
            self.n, _ptr(kind, ctypes.c_int32), _ptr(tq, ctypes.c_int32),
            _ptr(cq, ctypes.c_int32), _ptr(slot, ctypes.c_int32), len(kind),
            _ptr(angles, ctypes.c_double), _ptr(p0, ctypes.c_double),
            len(self.w), _ptr(self.flip, ctypes.c_uint32),
            _ptr(self.sign, ctypes.c_uint32), _ptr(self.ny, ctypes.c_int32),
            _ptr(self.w, ctypes.c_double),
            _ptr(self._scratch, ctypes.c_double)))

    def apply_tape_depolarizing(self, psi: np.ndarray, kind, tq, cq, slot,
                                angles, p1: float, p2: float,
                                seed: int) -> np.ndarray:
        """One depolarizing trajectory (reference VQE_qulacs_noise.py
        channel placement; see csim.cpp for the sampling convention)."""
        state = np.ascontiguousarray(
            psi.astype(np.complex128).view(np.float64))
        kind = np.ascontiguousarray(kind, dtype=np.int32)
        tq = np.ascontiguousarray(tq, dtype=np.int32)
        cq = np.ascontiguousarray(cq, dtype=np.int32)
        slot = np.ascontiguousarray(slot, dtype=np.int32)
        angles = np.ascontiguousarray(angles, dtype=np.float64)
        self._lib.csim_apply_tape_depolarizing(
            self.n, _ptr(kind, ctypes.c_int32), _ptr(tq, ctypes.c_int32),
            _ptr(cq, ctypes.c_int32), _ptr(slot, ctypes.c_int32),
            len(kind), _ptr(angles, ctypes.c_double),
            float(p1), float(p2), int(seed) & (2**64 - 1),
            _ptr(state, ctypes.c_double))
        return state.view(np.complex128)

    def tape_energy_depolarizing(self, psi0: np.ndarray, kind, tq, cq, slot,
                                 angles, p1: float, p2: float,
                                 seed: int) -> float:
        """Fused noisy-trajectory apply+expectation (the reference's noisy
        COBYLA inner loop: a fresh trajectory per evaluation)."""
        p0 = np.ascontiguousarray(psi0.astype(np.complex128).view(np.float64))
        kind = np.ascontiguousarray(kind, dtype=np.int32)
        tq = np.ascontiguousarray(tq, dtype=np.int32)
        cq = np.ascontiguousarray(cq, dtype=np.int32)
        slot = np.ascontiguousarray(slot, dtype=np.int32)
        angles = np.ascontiguousarray(angles, dtype=np.float64)
        return float(self._lib.csim_tape_energy_depolarizing(
            self.n, _ptr(kind, ctypes.c_int32), _ptr(tq, ctypes.c_int32),
            _ptr(cq, ctypes.c_int32), _ptr(slot, ctypes.c_int32), len(kind),
            _ptr(angles, ctypes.c_double), float(p1), float(p2),
            int(seed) & (2**64 - 1), _ptr(p0, ctypes.c_double),
            len(self.w), _ptr(self.flip, ctypes.c_uint32),
            _ptr(self.sign, ctypes.c_uint32), _ptr(self.ny, ctypes.c_int32),
            _ptr(self.w, ctypes.c_double),
            _ptr(self._scratch, ctypes.c_double)))
