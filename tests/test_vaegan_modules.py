"""WN / ConvReluNorm / flow modules: parity vs the reference module bag
(`encoder/hifi_vaegan/modules/modules.py`)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.vaegan.modules import (
    ConvReluNorm1D,
    WN1D,
    conv_relu_norm_params_from_torch,
    flip_flow,
    log_flow,
    wn_params_from_torch,
)

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "encoder"))

B, C, T = 2, 12, 40


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return (
        rng.standard_normal((B, C, T)).astype(np.float32),
        (rng.random((B, 1, T)) > 0.2).astype(np.float32),
    )


def _ref_modules():
    pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from encoder.hifi_vaegan.modules import modules as rm

    return rm


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_wn_parity(data):
    import torch

    rm = _ref_modules()
    x, mask = data
    twn = rm.WN(hidden_channels=C, kernel_size=3, dilation_rate=2, n_layers=4).eval()
    with torch.no_grad():
        ref = twn(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    mine = WN1D(C, 3, 2, 4).apply(
        {"params": wn_params_from_torch(twn.state_dict())},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_wn_folds_weight_norm(data):
    """The importer must fold g * v / ||v|| — perturb g and expect a change."""
    import torch

    rm = _ref_modules()
    x, mask = data
    twn = rm.WN(hidden_channels=C, kernel_size=3, dilation_rate=1, n_layers=2).eval()
    with torch.no_grad():
        twn.in_layers[0].weight_g.mul_(1.7)
        ref = twn(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    mine = WN1D(C, 3, 1, 2).apply(
        {"params": wn_params_from_torch(twn.state_dict())},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_conv_relu_norm_parity(data):
    import torch

    rm = _ref_modules()
    x, mask = data
    tm = rm.ConvReluNorm(C, 16, C, 5, 3, 0.0).eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    mine = ConvReluNorm1D(16, C, 5, 3).apply(
        {"params": conv_relu_norm_params_from_torch(tm.state_dict())},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_flows_parity(data):
    import torch

    rm = _ref_modules()
    x, mask = data
    pos = np.abs(x) + 0.1
    with torch.no_grad():
        ref_y, ref_ld = rm.Log()(torch.from_numpy(pos), torch.from_numpy(mask))
    y, ld = log_flow(jnp.asarray(pos.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref_y.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), ref_ld.numpy(), rtol=1e-4)
    # inverse round-trips
    back = log_flow(y, jnp.asarray(mask.transpose(0, 2, 1)), reverse=True)
    np.testing.assert_allclose(
        np.asarray(back).transpose(0, 2, 1), pos * mask, atol=1e-5
    )
    with torch.no_grad():
        ref_f, ref_fld = rm.Flip()(torch.from_numpy(x))
    f, fld = flip_flow(jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(f).transpose(0, 2, 1), ref_f.numpy(), atol=0)
    assert np.all(np.asarray(fld) == 0) and np.all(ref_fld.numpy() == 0)
    np.testing.assert_allclose(
        np.asarray(flip_flow(f, reverse=True)).transpose(0, 2, 1), x, atol=0
    )


def test_wn_shapes_and_mask():
    """Masked positions stay zero; output shape preserved (no torch needed)."""
    import jax

    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, C)), jnp.float32)
    mask = jnp.ones((B, T, 1)).at[:, T // 2 :].set(0.0)
    m = WN1D(C, 3, 2, 3)
    var = m.init(jax.random.PRNGKey(0), x, mask)
    out = m.apply(var, x, mask)
    assert out.shape == (B, T, C)
    assert bool(jnp.all(out[:, T // 2 :] == 0.0))
