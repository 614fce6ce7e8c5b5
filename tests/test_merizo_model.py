import os

import numpy as np
import pytest
import jax.numpy as jnp

from merizo_search_tpu.models.merizo import network as mznet
from merizo_search_tpu.models.merizo import ipa as ipa_mod
from merizo_search_tpu.models.merizo import decoder as dec_mod
from merizo_search_tpu.segment import postprocess as pp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "merizo.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("merizo golden not generated (tools/make_goldens.py)")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[len("sd."):]: golden[k] for k in golden.files if k.startswith("sd.")}
    return mznet.params_from_torch_state_dict(sd)


def test_alibi_parity(golden):
    ri = golden["ri"]  # [1, N]
    got = np.asarray(mznet.alibi_bias(jnp.asarray(ri)))
    want = golden["alibi_bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ipa_encoder_parity(golden, params):
    s = golden["s"] @ np.asarray(params["linear_s_in"]["w"])
    z = golden["z"] @ np.asarray(params["linear_z_in"]["w"])
    mask = np.ones(s.shape[:2], np.float32)
    got = np.asarray(ipa_mod.ipa_encoder(
        params["ipa"], jnp.asarray(s), jnp.asarray(z),
        jnp.asarray(golden["r"]), jnp.asarray(golden["t"]), jnp.asarray(mask)))
    want = golden["ipa_out"]
    # 6 IPA iterations + GRUs accumulate float error; 2e-3 abs observed bound
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert np.abs(got - want).mean() < 2e-4


def test_full_forward_parity(golden, params):
    """End-to-end: forward_features + host cleanup + confidence vs the
    reference network's (dom_ids, conf_res)."""
    mask = np.ones(golden["s"].shape[:2], np.float32)
    dm, bg = mznet.forward_features(
        params, jnp.asarray(golden["s"]), jnp.asarray(golden["z"]),
        jnp.asarray(golden["r"]), jnp.asarray(golden["t"]),
        jnp.asarray(golden["ri"]), jnp.asarray(mask))
    dm = np.asarray(dm)
    bg = np.asarray(bg)

    pred = dm[0].argmax(-1).astype(np.int64)
    pred = pp.clean_domains(pred, 50)
    pred = pp.clean_singletons(pred, 10)
    dom_ids = pred * bg[0].argmax(-1)

    np.testing.assert_array_equal(dom_ids, golden["dom_ids"])

    ids, _ = pp.get_ids(dom_ids)
    conf = np.zeros(len(dom_ids), np.float32)
    if len(ids):
        sel_idx, sel_mask = dec_mod.compact_domain_selection(dom_ids, ids)
        c = np.asarray(mznet.domain_confidence(
            params["decoder"], jnp.asarray(dm), jnp.asarray(sel_idx), jnp.asarray(sel_mask)))
        for j, d in enumerate(ids):
            conf[dom_ids == d] = c[j]
    np.testing.assert_allclose(conf, golden["conf_res"], atol=1e-3)


def test_padded_matches_unpadded(golden, params):
    """Bucketed padding must not change domain assignments."""
    n = golden["s"].shape[1]
    npad = 512
    mask = np.zeros((1, npad), np.float32)
    mask[0, :n] = 1

    def pad2(x, fill=0.0):
        out = np.full((1, npad) + x.shape[2:], fill, x.dtype)
        out[:, :n] = x
        return out

    z = np.zeros((1, npad, npad, 1), np.float32)
    z[:, :n, :n] = golden["z"]
    r = np.zeros((1, npad, 3, 3), np.float32)
    r[:, :, 0, 0] = r[:, :, 1, 1] = r[:, :, 2, 2] = 1.0
    r[:, :n] = golden["r"]

    dm_p, bg_p = mznet.forward_features(
        params, jnp.asarray(pad2(golden["s"])), jnp.asarray(z),
        jnp.asarray(r), jnp.asarray(pad2(golden["t"])),
        jnp.asarray(pad2(golden["ri"])), jnp.asarray(mask))
    dm_e, bg_e = mznet.forward_features(
        params, jnp.asarray(golden["s"]), jnp.asarray(golden["z"]),
        jnp.asarray(golden["r"]), jnp.asarray(golden["t"]),
        jnp.asarray(golden["ri"]), jnp.asarray(np.ones((1, n), np.float32)))
    np.testing.assert_allclose(np.asarray(dm_p)[0, :n], np.asarray(dm_e)[0], atol=2e-3)
    assert (np.asarray(dm_p)[0, :n].argmax(-1) == np.asarray(dm_e)[0].argmax(-1)).mean() > 0.995
    assert (np.asarray(bg_p)[0, :n].argmax(-1) == np.asarray(bg_e)[0].argmax(-1)).mean() > 0.995


def test_rotary_matches_published_rope_definition():
    """Independent check of the rotary quirk path (VERDICT r2: the golden
    was generated with a hand-written rotary_embedding_torch stand-in, so
    golden parity alone could hide a stub+port co-drift). This pins the JAX
    rotary against the PUBLISHED RoFormer definition (Su et al. 2021,
    eq. 34: interleaved pairs (x_{2i}, x_{2i+1}) rotated by angle
    pos * theta_i, theta_i = 10000^(-2i/d)) implemented here from the
    formula with explicit 2x2 rotation matrices — independent of both the
    stub and the port. rotary_embedding_torch's default path implements
    exactly this definition (theta=10000, interleaved repeat, rotate_half
    = stack((-x2, x1))), applied to the first dim*2 channels."""
    from merizo_search_tpu.models.merizo import ipa as ipa_mod

    rng = np.random.default_rng(5)
    B, N, H, C = 2, 3, ipa_mod.N_HEADS, ipa_mod.C_HIDDEN
    x = rng.normal(size=(B, N, H, C)).astype(np.float32)
    got = np.asarray(ipa_mod._rotary(jnp.asarray(x)))

    rot_dim = C // 2
    d = rot_dim  # rotary "positions" are the head indices (the quirk)
    theta = 10000.0 ** (-np.arange(0, d, 2, dtype=np.float64) / d)
    want = x.copy().astype(np.float64)
    for pos in range(H):  # head index acts as the position
        for i, th in enumerate(theta):
            a = pos * th
            c, s = np.cos(a), np.sin(a)
            x0 = x[:, :, pos, 2 * i].astype(np.float64)
            x1 = x[:, :, pos, 2 * i + 1].astype(np.float64)
            want[:, :, pos, 2 * i] = c * x0 - s * x1
            want[:, :, pos, 2 * i + 1] = s * x0 + c * x1
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)
