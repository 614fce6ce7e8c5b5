"""CLI platform selection.

On images whose sitecustomize registers an out-of-tree TPU plugin at
interpreter start, setting JAX_PLATFORMS=cpu in the environment alone
deadlocks JAX backend init (plugin discovery still contacts the device
tunnel), while updating the config API before first backend use works.
The CLI therefore mirrors the env override through jax.config — the same
trick tests/conftest.py uses. These tests pin that mirroring logic.
"""

import jax

from merizo_search_tpu import cli


def test_apply_device_mirrors_env(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    cli._apply_device(None)
    assert jax.config.jax_platforms == "cpu"


def test_apply_device_flag_wins_over_env(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "nonexistent-platform")
    cli._apply_device("cpu")
    assert jax.config.jax_platforms == "cpu"


def test_apply_device_ignores_plugin_platform_env(monkeypatch):
    # images preset JAX_PLATFORMS to an out-of-tree plugin name (e.g.
    # "axon"); the config API rejects unknown names, so mirroring it would
    # break every default-environment run — it must be left untouched
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    before = jax.config.jax_platforms
    cli._apply_device(None)
    assert jax.config.jax_platforms == before


def test_apply_device_reference_aliases(monkeypatch):
    # the reference's -d vocabulary: cuda -> accelerator, mps -> cpu
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    cli._apply_device("mps")
    assert jax.config.jax_platforms == "cpu"
