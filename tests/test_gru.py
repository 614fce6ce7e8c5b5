import numpy as np
import pytest
import torch

from merizo_search_tpu.ops.gru import bigru, gru_params_from_torch


@pytest.mark.parametrize("input_size,hidden,layers,t", [(20, 32, 2, 17), (64, 32, 2, 40)])
def test_bigru_matches_torch(input_size, hidden, layers, t):
    torch.manual_seed(0)
    g = torch.nn.GRU(input_size=input_size, hidden_size=hidden, num_layers=layers,
                     batch_first=True, bidirectional=True).eval()
    x = torch.randn(3, t, input_size)
    with torch.no_grad():
        out_t, hn_t = g(x)
    params = gru_params_from_torch({"g." + k: v for k, v in g.state_dict().items()}, "g", layers)
    mask = np.ones((3, t), np.float32)
    out_j, h_rev = bigru(params, np.asarray(x.numpy()), mask)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    # h_n[-1] is the top layer's reverse-direction final state
    np.testing.assert_allclose(np.asarray(h_rev), hn_t[-1].numpy(), atol=1e-5)


def test_bigru_padded_matches_exact():
    torch.manual_seed(1)
    g = torch.nn.GRU(input_size=16, hidden_size=24, num_layers=2,
                     batch_first=True, bidirectional=True).eval()
    params = gru_params_from_torch({"g." + k: v for k, v in g.state_dict().items()}, "g", 2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 11, 16)).astype(np.float32)
    with torch.no_grad():
        out_t, hn_t = g(torch.from_numpy(x))
    # pad to length 32
    xp = np.zeros((1, 32, 16), np.float32)
    xp[:, :11] = x
    mask = np.zeros((1, 32), np.float32)
    mask[:, :11] = 1
    out_j, h_rev = bigru(params, xp, mask)
    np.testing.assert_allclose(np.asarray(out_j)[:, :11], out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_rev), hn_t[-1].numpy(), atol=1e-5)


def test_scan_dir_parity_with_bidir():
    """_scan_dir is the readable single-direction spec; the production
    direction-batched _scan_bidir must match it in both directions (ADVICE
    r2: pin the reference path so the two cannot drift)."""
    import jax.numpy as jnp

    from merizo_search_tpu.ops.gru import _scan_bidir, _scan_dir

    rng = np.random.default_rng(7)
    B, T, I, H = 3, 11, 8, 6
    x = jnp.asarray(rng.normal(size=(B, T, I)).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[1, 7:] = 0.0
    mask[2, 4:] = 0.0
    mask = jnp.asarray(mask)
    layer = {f"{w}_{d}": jnp.asarray(rng.normal(
        size=(I if w == "wi" else H, 3 * H) if w.startswith("w") else (3 * H,)
        ).astype(np.float32) * 0.3)
        for w in ("wi", "wh", "bi", "bh") for d in ("f", "b")}

    out, h_rev = _scan_bidir(x, mask, layer)
    out_f, _ = _scan_dir(x, mask, layer["wi_f"], layer["wh_f"],
                         layer["bi_f"], layer["bh_f"])
    xr, mr = jnp.flip(x, axis=1), jnp.flip(mask, axis=1)
    out_b, h_b = _scan_dir(xr, mr, layer["wi_b"], layer["wh_b"],
                           layer["bi_b"], layer["bh_b"])
    ref = jnp.concatenate([out_f, jnp.flip(out_b, axis=1)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_rev), np.asarray(h_b), atol=1e-6)
