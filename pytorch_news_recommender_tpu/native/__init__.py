"""ctypes bindings for the native (C++) preprocessing fast path.

Builds ``mind_native.cpp`` on demand with ``g++ -O3`` (no pybind11 — plain C
ABI + ctypes, per the environment's toolchain constraints) and caches the
shared object next to the source. Falls back cleanly: ``available()`` returns
False when no compiler is present, and ``data/mind.py`` keeps its pure-Python
path — both paths are BIT-IDENTICAL by construction (same splitmix64
hash-shuffle spec; asserted by ``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import sys
from typing import Dict, Optional, Tuple

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "mind_native.cpp"
_LIB = _DIR / "libmind_native.so"

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared object if stale; returns an error string or None."""
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return None
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    _build_error = _build()
    if _build_error is not None:
        print(f"native build failed, using Python path: {_build_error}",
              file=sys.stderr)
        return None
    lib = ctypes.CDLL(str(_LIB))
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.mind_free.argtypes = [ctypes.c_void_p]
    lib.mind_build_train.restype = ctypes.c_int64
    lib.mind_build_train.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(i32p),
    ]
    lib.mind_build_eval.restype = ctypes.c_int64
    lib.mind_build_eval.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(i64p),
        ctypes.POINTER(i64p), ctypes.POINTER(i32p), ctypes.POINTER(i8p),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mind_batch_dedup.restype = ctypes.c_int64
    lib.mind_batch_dedup.argtypes = [
        i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        i32p, ctypes.c_int64, i32p, i32p,
    ]
    lib.mind_tokenize_ids.restype = ctypes.c_int64
    lib.mind_tokenize_ids.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int32,
        i32p, ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _take(lib, ptr, shape, dtype) -> np.ndarray:
    """Copy a malloc'd buffer into numpy and free it."""
    n = int(np.prod(shape))
    if n == 0 or not ptr:
        if ptr:
            lib.mind_free(ptr)
        return np.zeros(shape, dtype)
    buf = np.ctypeslib.as_array(ptr, shape=(n,))
    out = np.array(buf, dtype=dtype, copy=True).reshape(shape)
    lib.mind_free(ptr)
    return out


def _index_blob(index: Dict[str, int]) -> bytes:
    """Serialize an id->1-based-index dict as a '\\n'-joined blob in index
    order (the C++ side rebuilds the same mapping)."""
    ordered = sorted(index.items(), key=lambda kv: kv[1])
    for i, (_, v) in enumerate(ordered):
        assert v == i + 1, "index dict must be dense 1-based"
    return "\n".join(k for k, _ in ordered).encode("utf-8")


def build_train_samples(
    behaviors_path: str | pathlib.Path,
    news_index: Dict[str, int],
    user_index: Dict[str, int],
    history_len: int,
    sample_size: int,
    min_history: int,
    seed: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native train-group builder; returns (browsed, cand, user) or None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    browsed_p, cand_p, user_p = i32p(), i32p(), i32p()
    n = lib.mind_build_train(
        str(behaviors_path).encode(), _index_blob(news_index),
        _index_blob(user_index),
        history_len, sample_size, min_history, seed,
        ctypes.byref(browsed_p), ctypes.byref(cand_p), ctypes.byref(user_p))
    if n < 0:
        raise FileNotFoundError(behaviors_path)
    browsed = _take(lib, browsed_p, (n, history_len), np.int32)
    cand = _take(lib, cand_p, (n, 1 + sample_size), np.int32)
    user = _take(lib, user_p, (n,), np.int32)
    return browsed, cand, user


def build_eval_split(
    behaviors_path: str | pathlib.Path,
    news_index: Dict[str, int],
    user_index: Dict[str, int],
    history_len: int,
    with_labels: bool,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Native eval-split builder; returns
    (browsed, user, keys, offsets, cand_flat, label_flat) or None."""
    lib = _load()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    browsed_p, user_p = i32p(), i32p()
    keys_p, offsets_p = i64p(), i64p()
    cand_p, label_p = i32p(), i8p()
    flat_len = ctypes.c_int64()
    m = lib.mind_build_eval(
        str(behaviors_path).encode(), _index_blob(news_index),
        _index_blob(user_index), history_len, int(with_labels),
        ctypes.byref(browsed_p), ctypes.byref(user_p), ctypes.byref(keys_p),
        ctypes.byref(offsets_p), ctypes.byref(cand_p), ctypes.byref(label_p),
        ctypes.byref(flat_len))
    if m < 0:
        raise FileNotFoundError(behaviors_path)
    L = flat_len.value
    return (
        _take(lib, browsed_p, (m, history_len), np.int32),
        _take(lib, user_p, (m,), np.int32),
        _take(lib, keys_p, (m,), np.int64),
        _take(lib, offsets_p, (m + 1,), np.int64),
        _take(lib, cand_p, (L,), np.int32),
        _take(lib, label_p, (L,), np.int8),
    )


def tokenize_ids(
    texts: "list[str]",
    vocab: Dict[str, int],
    length: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native word-id conversion (reference tokenization semantics:
    lowercase + digit-strip + ``\\w+`` + in-vocab; see ``data/mind.py``).

    Returns ``(ids[n, length] int32, fallback[n] uint8)`` where flagged
    rows (non-ASCII text — Python's unicode ``\\w``/``lower`` may differ)
    MUST be redone by the caller with the Python path; the combined result
    is bit-identical to the pure-Python loop. Returns None when the native
    library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(texts)
    ids = np.zeros((max(n, 1), length), np.int32)
    fallback = np.zeros(max(n, 1), np.uint8)
    if n == 0:
        return ids[:0], fallback[:0]
    # '\n' join is semantically neutral (a non-word separator like ' '),
    # but a text CONTAINING '\n' would desync rows — impossible for
    # TSV-parsed fields, guarded anyway.
    if any("\n" in t for t in texts):
        return None
    blob = "\n".join(texts).encode("utf-8")
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.mind_tokenize_ids(
        blob, n, _index_blob(vocab), length,
        ids.ctypes.data_as(i32p),
        fallback.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != n:
        return None
    return ids, fallback


def batch_dedup(
    browsed: np.ndarray, cand: np.ndarray,
) -> Optional[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]:
    """Native per-batch news dedup (runtime hot path).

    Bit-identical to ``np.unique(concat([0], browsed, cand),
    return_inverse=True)``: returns ``(u, uniq_buf, browsed_idx, cand_idx)``
    where ``uniq_buf[:u]`` holds the ascending distinct ids (pad id 0 always
    included) and the index arrays are ranks into it, shaped like the
    inputs. ``uniq_buf`` is sized ``browsed.size + cand.size + 1`` and
    zero-padded past ``u``, so callers can slice any bucket width ``>= u``
    from it directly. Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    browsed = np.ascontiguousarray(browsed, np.int32)
    cand = np.ascontiguousarray(cand, np.int32)
    nb, nc = browsed.size, cand.size
    cap = nb + nc + 1
    uniq = np.empty(cap, np.int32)
    bidx = np.empty(nb, np.int32)
    cidx = np.empty(nc, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u = lib.mind_batch_dedup(
        browsed.ctypes.data_as(i32p), nb, cand.ctypes.data_as(i32p), nc,
        uniq.ctypes.data_as(i32p), cap,
        bidx.ctypes.data_as(i32p), cidx.ctypes.data_as(i32p))
    assert u > 0, "mind_batch_dedup failed"
    return int(u), uniq, bidx.reshape(browsed.shape), cidx.reshape(cand.shape)
