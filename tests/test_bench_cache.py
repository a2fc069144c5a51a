"""bench.py cache helpers — the round-gate capturability machinery.

The driver-visible benchmark relies on ``benchmarks/bench_cache.json``
(baseline ms/step + kernel-check pass token) being keyed correctly: a wrong
key would either skip checks that should re-run (stale pass) or re-measure
on every run (timeout risk). These are pure-helper tests; the end-to-end
path runs on hardware via ``python bench.py``.
"""

import importlib.util
import json
import pathlib


def _load_bench():
    path = pathlib.Path(__file__).parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_kernel_source_hash_is_deterministic_and_tracks_ops():
    bench = _load_bench()
    h1 = bench._kernel_source_hash()
    h2 = bench._kernel_source_hash()
    assert h1 == h2
    assert len(h1) == 16 and int(h1, 16) >= 0  # 16 hex chars
    # the committed pass token must match the current kernel sources —
    # otherwise the driver run re-runs the checks (and may skip them under
    # deadline), weakening the artifact
    cache = json.loads(bench.CACHE_PATH.read_text())
    assert cache["kernel_check"]["source_hash"] == h1, (
        "benchmarks/bench_cache.json kernel_check.source_hash is stale — "
        "re-run `python bench.py --refresh` on the TPU host and commit")


def test_pkg_source_hash_keys_baseline():
    """The baseline cache entry must be keyed by the package source hash
    (round-3 ADVICE medium: the baseline path executes this repo's model/
    train code, so source changes must invalidate the cached ms_per_step).
    Unlike the kernel token, freshness is NOT asserted here: a pkg_hash
    mismatch re-measures the baseline before the headline print (safe, just
    slower), so a stale entry cannot skew the artifact."""
    bench = _load_bench()
    h1 = bench._pkg_source_hash()
    assert h1 == bench._pkg_source_hash()
    assert len(h1) == 16 and int(h1, 16) >= 0
    assert h1 != bench._kernel_source_hash()   # distinct scopes
    cache = json.loads(bench.CACHE_PATH.read_text())
    assert "pkg_hash" in cache["baseline"], (
        "committed baseline entry predates pkg_hash keying — re-run "
        "`python bench.py --refresh` on the TPU host and commit")


def test_cache_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "c.json")
    assert bench._load_cache() == {}          # missing file -> {}
    bench._save_cache({"a": 1})
    assert bench._load_cache() == {"a": 1}
    (tmp_path / "c.json").write_text("{corrupt")
    assert bench._load_cache() == {}          # corrupt file -> {}


def test_env_key_fields():
    bench = _load_bench()
    k = bench._env_key()
    assert set(k) == {"device_kind", "jaxlib"}
    assert all(isinstance(v, str) and v for v in k.values())
