"""Checkpoint-loading path tests (VERDICT r2 item 8).

The real reference checkpoints are stripped blobs, so the on-disk loader
paths — Merizo's three-way-split weights directory (reference
predict.py:117-140) and Foldclass's single .pt (dbsearch.py:43) — were
previously untested. These tests synthesize real torch checkpoint files
from the golden state_dict arrays (tests/golden/*.npz carry the exact
torch tensors the golden activations were generated from) and assert the
disk loaders produce the identical parameter tree as the in-memory
converter — which the model-parity tests already pin against golden
activations, closing the loop disk -> converter -> forward.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden_sd(name):
    z = np.load(os.path.join(GOLDEN_DIR, name))
    return {k[len("sd."):]: torch.from_numpy(np.asarray(z[k]))
            for k in z.files if k.startswith("sd.")}


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert isinstance(b, dict) and set(a) == set(b), path
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_merizo_split_weights_dir_loader(tmp_path):
    """predict.py:117-140 parity: weights sharded across several .pt files
    purely by size, merged at load. Shard the golden state_dict three ways
    and load through the directory path."""
    from merizo_search_tpu.models.merizo import network as mznet

    sd = _golden_sd("merizo.npz")
    keys = sorted(sd.keys())
    wdir = tmp_path / "weights"
    wdir.mkdir()
    for part in range(3):
        shard = {k: sd[k] for k in keys[part::3]}
        torch.save(shard, wdir / f"weights_part_{part}.pt")
    # a non-.pt distractor must be ignored
    (wdir / "README.txt").write_text("not a checkpoint")

    loaded = mznet.load_merizo_params(str(wdir))
    direct = mznet.params_from_torch_state_dict(
        {k: v for k, v in sd.items()})
    _assert_tree_equal(direct, loaded)


def test_foldclass_pt_loader(tmp_path):
    """dbsearch.py:43 parity: FINAL_foldclass_model.pt loaded as a plain
    state_dict file."""
    from merizo_search_tpu.models import foldclass as fc
    from merizo_search_tpu.pipeline.embed import load_foldclass_params

    sd = _golden_sd("foldclass.npz")
    path = tmp_path / "FINAL_foldclass_model.pt"
    torch.save(sd, path)
    loaded = load_foldclass_params(str(path))
    direct = fc.params_from_torch_state_dict(sd)
    _assert_tree_equal(direct, loaded)


def test_foldclass_loaded_forward_matches_golden(tmp_path):
    """End-to-end: the disk-loaded params reproduce the golden embedding."""
    import jax.numpy as jnp

    from merizo_search_tpu.models import foldclass as fc
    from merizo_search_tpu.pipeline.embed import load_foldclass_params

    z = np.load(os.path.join(GOLDEN_DIR, "foldclass.npz"))
    sd = _golden_sd("foldclass.npz")
    path = tmp_path / "fc.pt"
    torch.save(sd, path)
    params = load_foldclass_params(str(path))
    coords = z["coords_mid"]
    emb = fc.embed(params, jnp.asarray(coords[None]),
                   jnp.ones((1, coords.shape[0]), jnp.float32))
    np.testing.assert_allclose(np.asarray(emb)[0], z["emb_mid"].reshape(-1),
                               atol=2e-4)
