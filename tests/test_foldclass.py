import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merizo_search_tpu.models import foldclass as fc

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "foldclass.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("foldclass golden not generated (tools/make_goldens.py)")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[len("sd."):]: golden[k] for k in golden.files if k.startswith("sd.")}
    return fc.params_from_torch_state_dict(sd)


@pytest.mark.parametrize("case", ["small", "mid", "large"])
def test_torch_parity(golden, params, case):
    coords = golden[f"coords_{case}"]
    want = golden[f"emb_{case}"][0]
    got = np.asarray(fc.embed(params, coords[None]))[0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_mask_matches_unpadded(golden, params):
    """Padding + mask must give identical embeddings to the exact-length run."""
    coords = golden["coords_mid"]  # [100, 3]
    n = len(coords)
    exact = np.asarray(fc.embed(params, coords[None]))[0]
    padded = np.zeros((1, 160, 3), np.float32)
    padded[0, :n] = coords
    mask = np.zeros((1, 160), np.float32)
    mask[0, :n] = 1.0
    got = np.asarray(fc.embed(params, padded, mask))[0]
    np.testing.assert_allclose(got, exact, atol=1e-4, rtol=1e-3)


def test_batched_matches_individual(golden, params):
    c1, c2 = golden["coords_small"], golden["coords_mid"]
    n = 128
    batch = np.zeros((2, n, 3), np.float32)
    mask = np.zeros((2, n), np.float32)
    batch[0, :len(c1)] = c1
    mask[0, :len(c1)] = 1
    batch[1, :len(c2)] = c2
    mask[1, :len(c2)] = 1
    got = np.asarray(fc.embed(params, batch, mask))
    e1 = np.asarray(fc.embed(params, c1[None]))[0]
    e2 = np.asarray(fc.embed(params, c2[None]))[0]
    np.testing.assert_allclose(got[0], e1, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1], e2, atol=1e-4, rtol=1e-3)


def test_random_init_runs():
    params = fc.init_params(jax.random.PRNGKey(0))
    out = fc.embed(params, np.zeros((1, 64, 3), np.float32))
    assert out.shape == (1, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_sinusoidal_pe_matches_golden(golden):
    pe = fc.sinusoidal_pe()
    want = golden["sd.posenc_as.pe"].reshape(-1, 128)
    # float32 exp/sin rounding differs slightly between torch and numpy at
    # large position*frequency arguments; 3e-4 absolute is the observed bound.
    np.testing.assert_allclose(pe, want, atol=3e-4)
