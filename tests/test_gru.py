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
