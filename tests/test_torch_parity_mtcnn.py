"""Cross-framework numerical parity: MTCNN P/R/O/L-Net vs torch mirrors.

The reference cascade runs four MXNet checkpoints (det1..det4,
code/mtcnn_detector.py:52-65).  These tests rebuild each tower in
PyTorch — VALID convs, channel-wise PReLU, Caffe ceil-mode max pooling,
NHWC-flatten dense heads — port randomly-initialised weights into the
flax modules, and demand near-bit-equal outputs.  Any drift in padding,
pooling geometry, flatten ordering or head layout fails here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from alink_tpu.models.mtcnn import LNet, ONet, PNet, RNet  # noqa: E402

# Full e2e layer: runs in the nightly/full suite (see pytest.ini tiers).
pytestmark = pytest.mark.slow



def _port_conv(tconv):
    out = {"kernel": jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if tconv.bias is not None:
        out["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    return out


def _port_dense(tfc):
    return {
        "kernel": jnp.asarray(tfc.weight.detach().numpy().T),
        "bias": jnp.asarray(tfc.bias.detach().numpy()),
    }


def _port_prelu(tp):
    return {"alpha": jnp.asarray(tp.weight.detach().numpy())}


def _randomise_prelus(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.PReLU):
                m.weight.uniform_(0.05, 0.5)


def _nhwc_flat(x):
    """torch NCHW activations -> flax flatten order (NHWC row-major)."""
    return x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)


class TorchPNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 10, 3)
        self.prelu1 = tnn.PReLU(10)
        self.pool = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(10, 16, 3)
        self.prelu2 = tnn.PReLU(16)
        self.conv3 = tnn.Conv2d(16, 32, 3)
        self.prelu3 = tnn.PReLU(32)
        self.cls = tnn.Conv2d(32, 2, 1)
        self.reg = tnn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool(x)
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        prob = torch.softmax(self.cls(x), dim=1)
        return prob, self.reg(x)


def test_pnet_matches_torch():
    torch.manual_seed(10)
    tm = TorchPNet().eval()
    _randomise_prelus(tm)
    model = PNet(dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))
    p = {
        "Conv_0": _port_conv(tm.conv1), "_PReLU_0": _port_prelu(tm.prelu1),
        "Conv_1": _port_conv(tm.conv2), "_PReLU_1": _port_prelu(tm.prelu2),
        "Conv_2": _port_conv(tm.conv3), "_PReLU_2": _port_prelu(tm.prelu3),
        "Conv_3": _port_conv(tm.cls), "Conv_4": _port_conv(tm.reg),
    }
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(init)

    # Odd pyramid-level size exercises the ceil-mode pool padding.
    for size in (12, 37):
        x = np.random.default_rng(size).uniform(
            -1, 1, (2, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            tprob, treg = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        prob, reg = model.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(prob), tprob.numpy().transpose(0, 2, 3, 1),
            atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(reg), treg.numpy().transpose(0, 2, 3, 1),
            atol=1e-5, rtol=1e-4)


class TorchRNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 28, 3)
        self.prelu1 = tnn.PReLU(28)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(28, 48, 3)
        self.prelu2 = tnn.PReLU(48)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(48, 64, 2)
        self.prelu3 = tnn.PReLU(64)
        self.fc = tnn.Linear(3 * 3 * 64, 128)
        self.prelu4 = tnn.PReLU(128)
        self.cls = tnn.Linear(128, 2)
        self.reg = tnn.Linear(128, 4)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = self.prelu4(self.fc(_nhwc_flat(x)))
        return torch.softmax(self.cls(x), dim=1), self.reg(x)


def test_rnet_matches_torch():
    torch.manual_seed(11)
    tm = TorchRNet().eval()
    _randomise_prelus(tm)
    model = RNet(dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))
    p = {
        "Conv_0": _port_conv(tm.conv1), "_PReLU_0": _port_prelu(tm.prelu1),
        "Conv_1": _port_conv(tm.conv2), "_PReLU_1": _port_prelu(tm.prelu2),
        "Conv_2": _port_conv(tm.conv3), "_PReLU_2": _port_prelu(tm.prelu3),
        "Dense_0": _port_dense(tm.fc), "_PReLU_3": _port_prelu(tm.prelu4),
        "Dense_1": _port_dense(tm.cls), "Dense_2": _port_dense(tm.reg),
    }
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(init)

    x = np.random.default_rng(11).uniform(
        -1, 1, (4, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        tprob, treg = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    prob, reg = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), treg.numpy(),
                               atol=1e-5, rtol=1e-4)


class TorchONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 3)
        self.prelu1 = tnn.PReLU(32)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(32, 64, 3)
        self.prelu2 = tnn.PReLU(64)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(64, 64, 3)
        self.prelu3 = tnn.PReLU(64)
        self.pool3 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = tnn.Conv2d(64, 128, 2)
        self.prelu4 = tnn.PReLU(128)
        self.fc = tnn.Linear(3 * 3 * 128, 256)
        self.prelu5 = tnn.PReLU(256)
        self.cls = tnn.Linear(256, 2)
        self.reg = tnn.Linear(256, 4)
        self.lmk = tnn.Linear(256, 10)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = self.prelu5(self.fc(_nhwc_flat(x)))
        return (torch.softmax(self.cls(x), dim=1), self.reg(x),
                self.lmk(x))


def test_onet_matches_torch():
    torch.manual_seed(12)
    tm = TorchONet().eval()
    _randomise_prelus(tm)
    model = ONet(dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    p = {
        "Conv_0": _port_conv(tm.conv1), "_PReLU_0": _port_prelu(tm.prelu1),
        "Conv_1": _port_conv(tm.conv2), "_PReLU_1": _port_prelu(tm.prelu2),
        "Conv_2": _port_conv(tm.conv3), "_PReLU_2": _port_prelu(tm.prelu3),
        "Conv_3": _port_conv(tm.conv4), "_PReLU_3": _port_prelu(tm.prelu4),
        "Dense_0": _port_dense(tm.fc), "_PReLU_4": _port_prelu(tm.prelu5),
        "Dense_1": _port_dense(tm.cls), "Dense_2": _port_dense(tm.reg),
        "Dense_3": _port_dense(tm.lmk),
    }
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(init)

    x = np.random.default_rng(12).uniform(
        -1, 1, (4, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        tprob, treg, tlmk = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    prob, reg, lmk = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), treg.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lmk), tlmk.numpy(),
                               atol=1e-5, rtol=1e-4)


class TorchLNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(15, 28, 3)
        self.prelu1 = tnn.PReLU(28)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(28, 48, 3)
        self.prelu2 = tnn.PReLU(48)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(48, 64, 2)
        self.prelu3 = tnn.PReLU(64)
        self.fc = tnn.Linear(3 * 3 * 64, 256)
        self.prelu4 = tnn.PReLU(256)
        self.heads = tnn.ModuleList([tnn.Linear(256, 2) for _ in range(5)])

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = self.prelu4(self.fc(_nhwc_flat(x)))
        return torch.stack([torch.sigmoid(h(x)) for h in self.heads], dim=1)


def test_lnet_matches_torch():
    torch.manual_seed(13)
    tm = TorchLNet().eval()
    _randomise_prelus(tm)
    model = LNet(dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 15)))
    p = {
        "Conv_0": _port_conv(tm.conv1), "_PReLU_0": _port_prelu(tm.prelu1),
        "Conv_1": _port_conv(tm.conv2), "_PReLU_1": _port_prelu(tm.prelu2),
        "Conv_2": _port_conv(tm.conv3), "_PReLU_2": _port_prelu(tm.prelu3),
        "Dense_0": _port_dense(tm.fc), "_PReLU_3": _port_prelu(tm.prelu4),
    }
    for i, h in enumerate(tm.heads):
        p[f"Dense_{i + 1}"] = _port_dense(h)
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(init)

    x = np.random.default_rng(13).uniform(
        -1, 1, (3, 24, 24, 15)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
