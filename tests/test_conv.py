"""Parity + streaming-consistency tests for causal conv ops against the
PyTorch reference modules (modules/vqgan/modules/firefly.py FishConvNet /
FishTransConvNet)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from streamvoiceanon_tpu.ops import conv

fireref = pytest.importorskip("modules.vqgan.modules.firefly")


def torch_fish_conv(x, cin, cout, k, stride=1, dilation=1, groups=1, seed=0):
    torch.manual_seed(seed)
    m = fireref.FishConvNet(cin, cout, k, stride=stride, dilation=dilation, groups=groups)
    with torch.no_grad():
        y = m(torch.from_numpy(x))
    w = m.conv.weight.detach().numpy()  # (cout, cin/g, k)
    b = m.conv.bias.detach().numpy()
    return y.numpy(), w, b


@pytest.mark.parity
@pytest.mark.parametrize(
    "cin,cout,k,stride,dilation,groups",
    [
        (8, 16, 7, 1, 1, 1),
        (8, 8, 7, 1, 1, 8),  # depthwise (ConvNeXt dwconv)
        (16, 16, 2, 2, 1, 1),  # FSQ downsample
        (8, 16, 3, 1, 5, 1),  # dilated resblock conv
        (8, 16, 13, 1, 1, 1),  # HiFiGAN pre/post conv
    ],
)
def test_causal_conv_matches_fishconv(rng, cin, cout, k, stride, dilation, groups):
    x = rng.standard_normal((2, cin, 64)).astype(np.float32)
    y_ref, w, b = torch_fish_conv(x, cin, cout, k, stride, dilation, groups)
    # torch weight (cout, cin/g, k) -> WIO (k, cin/g, cout)
    wj = jnp.asarray(np.transpose(w, (2, 1, 0)))
    y = conv.causal_conv1d(
        jnp.asarray(np.transpose(x, (0, 2, 1))),
        wj,
        jnp.asarray(b),
        stride=stride,
        dilation=dilation,
        groups=groups,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 2, 1)), y_ref, atol=1e-5, rtol=1e-5
    )


@pytest.mark.parity
@pytest.mark.parametrize(
    "cin,cout,k,stride",
    [
        (8, 8, 2, 2),  # FSQ upsample (stride == k)
        (16, 8, 16, 8),  # HiFiGAN up 1 (stride == k // 2)
        (16, 8, 4, 2),  # HiFiGAN up 3-5
    ],
)
def test_fish_trans_conv_matches_reference(rng, cin, cout, k, stride):
    x = rng.standard_normal((2, cin, 20)).astype(np.float32)
    torch.manual_seed(1)
    m = fireref.FishTransConvNet(cin, cout, k, stride=stride)
    with torch.no_grad():
        y_ref = m(torch.from_numpy(x)).numpy()
    w = m.conv.weight.detach().numpy()  # (cin, cout, k)
    b = m.conv.bias.detach().numpy()
    wj = jnp.asarray(np.transpose(w, (2, 0, 1)))  # (k, cin, cout)
    y = conv.fish_trans_conv1d(
        jnp.asarray(np.transpose(x, (0, 2, 1))), wj, jnp.asarray(b), stride=stride
    )
    y = np.transpose(np.asarray(y), (0, 2, 1))
    assert y.shape == y_ref.shape == (2, cout, 20 * stride)
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "k,stride,dilation", [(7, 1, 1), (2, 2, 1), (3, 1, 5), (7, 1, 1)]
)
def test_causal_conv_stream_prefix_consistency(rng, k, stride, dilation):
    """concat(stream(chunks)) == full(sequence) — the causal_cnn.py:175-184
    property, automated."""
    cin, cout, T = 6, 10, 48
    x = rng.standard_normal((1, T, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.3
    b = rng.standard_normal((cout,)).astype(np.float32)
    full = conv.causal_conv1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, dilation=dilation
    )
    state = conv.causal_conv1d_init_state(1, cin, k, stride=stride, dilation=dilation)
    chunks = []
    step = 8
    for i in range(0, T, step):
        state, y = conv.causal_conv1d_stream(
            state,
            jnp.asarray(x[:, i : i + step]),
            jnp.asarray(w),
            jnp.asarray(b),
            stride=stride,
            dilation=dilation,
        )
        chunks.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(chunks, axis=1), np.asarray(full), atol=1e-5
    )


@pytest.mark.parametrize("k,stride", [(2, 2), (16, 8), (4, 2)])
def test_fish_trans_conv_is_causal(rng, k, stride):
    """Changing inputs at frame >= t must not change outputs before stride*t."""
    cin, cout, T = 4, 4, 16
    x1 = rng.standard_normal((1, T, cin)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 10:] += 1.0
    w = rng.standard_normal((k, cin, cout)).astype(np.float32)
    y1 = np.asarray(conv.fish_trans_conv1d(jnp.asarray(x1), jnp.asarray(w), stride=stride))
    y2 = np.asarray(conv.fish_trans_conv1d(jnp.asarray(x2), jnp.asarray(w), stride=stride))
    np.testing.assert_allclose(y1[:, : 10 * stride], y2[:, : 10 * stride], atol=1e-6)


@pytest.mark.parametrize("k,stride", [(2, 2), (16, 8), (4, 2)])
def test_fish_trans_conv_stream_prefix_consistency(rng, k, stride):
    cin, cout, T, step = 4, 4, 24, 4
    x = rng.standard_normal((1, T, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    full = np.asarray(
        conv.fish_trans_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride)
    )
    state = conv.fish_trans_conv1d_init_state(1, cin, k, stride)
    outs = []
    for i in range(0, T, step):
        state, y = conv.fish_trans_conv1d_stream(
            state, jnp.asarray(x[:, i : i + step]), jnp.asarray(w), jnp.asarray(b), stride=stride
        )
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=1e-5)
