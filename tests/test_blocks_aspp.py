"""ASPP + DepthwiseSeparableConv2d vs a torch oracle.

The oracle mirrors the reference modules (detectron2/layers/aspp.py:14-144,
blocks.py:58-111) built from plain torch.nn pieces with the flax params
copied in, so agreement checks conv/dilation/pooling/resize semantics —
not shared code.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from cddmsl_tpu.models.blocks import ASPP, DepthwiseSeparableConv2d  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_depthwise_separable_parity():
    r = np.random.RandomState(0)
    x = r.randn(2, 9, 11, 6).astype(np.float32)
    m = DepthwiseSeparableConv2d(
        out_channels=8, kernel_size=3, padding=2, dilation=2,
        activation1=jax.nn.relu, activation2=jax.nn.relu,
    )
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = _t(x).permute(0, 3, 1, 2)
    # flax depthwise kernel (k, k, 1, C) -> torch (C, 1, k, k)
    dw_w = _t(p["depthwise"]["kernel"]).permute(3, 2, 0, 1)
    y = F.conv2d(xt, dw_w, _t(p["depthwise"]["bias"]), padding=2, dilation=2, groups=6)
    y = F.relu(y)
    pw_w = _t(p["pointwise"]["kernel"]).permute(3, 2, 0, 1)
    y = F.relu(F.conv2d(y, pw_w, _t(p["pointwise"]["bias"])))
    ref = y.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("pool", [None, (4, 4)])
def test_aspp_parity(pool):
    r = np.random.RandomState(1)
    x = r.randn(1, 8, 12, 5).astype(np.float32)
    m = ASPP(out_channels=7, dilations=(1, 2, 3), pool_kernel_size=pool)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = _t(x).permute(0, 3, 1, 2)

    def conv(name, inp, pad=0, dil=1):
        w = _t(p[name]["kernel"]).permute(3, 2, 0, 1)
        return F.conv2d(inp, w, _t(p[name]["bias"]), padding=pad, dilation=dil)

    branches = [F.relu(conv("conv1x1", xt))]
    for i, d in enumerate((1, 2, 3)):
        branches.append(F.relu(conv(f"atrous{i}", xt, pad=d, dil=d)))
    if pool is None:
        pooled = xt.mean(dim=(2, 3), keepdim=True)
    else:
        pooled = F.avg_pool2d(xt, kernel_size=pool, stride=1)
    pooled = F.relu(conv("image_pooling", pooled))
    branches.append(
        F.interpolate(pooled, size=xt.shape[-2:], mode="bilinear", align_corners=False)
    )
    y = torch.cat(branches, dim=1)
    y = F.relu(conv("project", y))
    ref = y.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_aspp_gn_and_dws_variant():
    """GN norm + depthwise-separable atrous branches build and run."""
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(1, 8, 8, 64).astype(np.float32))
    m = ASPP(out_channels=64, dilations=(6, 12, 18), norm="GN",
             use_depthwise_separable_conv=True, dropout=0.1)
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    out = m.apply(params, x)  # deterministic: dropout off
    assert out.shape == (1, 8, 8, 64)
    assert np.isfinite(np.asarray(out)).all()
    # no-norm convs carry biases; GN convs must not
    assert "bias" not in params["params"]["conv1x1"]
    assert "bias" in params["params"]["image_pooling"]  # pooling conv keeps bias

    # pool size must divide the input
    bad = ASPP(out_channels=8, dilations=(1, 2, 3), pool_kernel_size=(3, 3))
    with pytest.raises(ValueError):
        bad.init(jax.random.PRNGKey(0), x)
