"""Host-change guard on the persistent XLA compilation cache
(utils/cache.py): CPU-backend entries embed machine code for the exact
host CPU, and deserializing a foreign entry segfaults the process —
the guard must wipe on fingerprint mismatch (or unknown provenance)
and keep entries on a matching host."""

import os

import pytest

from light_path_tracer_tpu.utils.cache import (
    enable_compilation_cache, _machine_fingerprint, _FINGERPRINT_FILE)


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """enable_compilation_cache flips PROCESS-WIDE jax config (cache
    dir + min-compile-time threshold). Without restoring it, every
    later test in the suite serializes its >2s CPU executables into
    this module's pytest tmp dir — XLA:CPU executable serialization
    has been observed to SEGFAULT the suite (put_executable_and_time)
    under full-suite load, and CI must not depend on that fragile AOT
    export path at all."""
    import jax
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      old_min)


@pytest.fixture(autouse=True)
def _lift_pytest_optout(monkeypatch):
    """conftest.py hard-disables the persistent cache for the whole
    suite (LPT_COMPILE_CACHE_OFF); these tests exercise the enable path
    itself, so lift the opt-out locally."""
    monkeypatch.delenv("LPT_COMPILE_CACHE_OFF", raising=False)


def _populate(path, name="jit_foo-cache"):
    os.makedirs(os.path.join(path, name), exist_ok=True)
    with open(os.path.join(path, name, "blob"), "wb") as f:
        f.write(b"\x00" * 16)


def test_optout_env_is_a_noop(tmp_path, monkeypatch):
    """With LPT_COMPILE_CACHE_OFF set (as conftest does for the whole
    suite), enable_compilation_cache must neither touch the directory
    nor flip jax config — this is what keeps cli/serve entry points
    cache-free under pytest."""
    import jax
    cache = str(tmp_path / "c0")
    monkeypatch.setenv("LPT_COMPILE_CACHE", cache)
    monkeypatch.setenv("LPT_COMPILE_CACHE_OFF", "1")
    before = jax.config.jax_compilation_cache_dir
    enable_compilation_cache()
    assert not os.path.exists(cache)
    assert jax.config.jax_compilation_cache_dir == before


def test_wipes_on_fingerprint_mismatch(tmp_path, monkeypatch):
    cache = str(tmp_path / "c1")
    os.makedirs(cache)
    _populate(cache)
    with open(os.path.join(cache, _FINGERPRINT_FILE), "w") as f:
        f.write("not-this-machine")
    monkeypatch.setenv("LPT_COMPILE_CACHE", cache)
    enable_compilation_cache()
    assert not os.path.exists(os.path.join(cache, "jit_foo-cache"))
    with open(os.path.join(cache, _FINGERPRINT_FILE)) as f:
        assert f.read().strip() == _machine_fingerprint()


def test_wipes_unknown_provenance(tmp_path, monkeypatch):
    # Pre-guard cache: entries but no marker -> start clean once.
    cache = str(tmp_path / "c2")
    os.makedirs(cache)
    _populate(cache)
    monkeypatch.setenv("LPT_COMPILE_CACHE", cache)
    enable_compilation_cache()
    assert not os.path.exists(os.path.join(cache, "jit_foo-cache"))


def test_keeps_entries_on_matching_host(tmp_path, monkeypatch):
    cache = str(tmp_path / "c3")
    monkeypatch.setenv("LPT_COMPILE_CACHE", cache)
    enable_compilation_cache()          # writes the marker
    _populate(cache)
    enable_compilation_cache()          # same host: must keep entries
    assert os.path.exists(os.path.join(cache, "jit_foo-cache", "blob"))


def test_fingerprint_is_stable():
    assert _machine_fingerprint() == _machine_fingerprint()
