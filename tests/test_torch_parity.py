"""Cross-framework numerical parity: VGGFaceResNet50 vs a torch reference.

SURVEY.md section 7, hard part (c): embeddings must match a reference
trained in another framework, which requires the topology, padding, BN and
pooling conventions to agree exactly.  This test builds the same
Caffe-style ResNet-50 (stride on the first 1x1 of each downsampling
bottleneck — the keras_vggface convention our model follows) in PyTorch,
ports its randomly-initialised weights into the flax model (OIHW->HWIO
transposes, BN stat mapping), and demands near-bit-equal outputs.

Any silent divergence in conv padding, pooling, BN epsilon placement or
weight layout fails this test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from alink_tpu.models import VGGFaceResNet50  # noqa: E402

# Full e2e layer: runs in the nightly/full suite (see pytest.ini tiers).
pytestmark = pytest.mark.slow



class TorchBottleneck(tnn.Module):
    """Caffe-style bottleneck: stride on the first 1x1 conv."""

    def __init__(self, cin, f, stride=1, project=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, f, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(f, eps=1e-3)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(f, eps=1e-3)
        self.conv3 = tnn.Conv2d(f, 4 * f, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(4 * f, eps=1e-3)
        self.project = project
        if project:
            self.conv_sc = tnn.Conv2d(cin, 4 * f, 1, stride=stride,
                                      bias=False)
            self.bn_sc = tnn.BatchNorm2d(4 * f, eps=1e-3)
        self.relu = tnn.ReLU()

    def forward(self, x):
        sc = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.project:
            sc = self.bn_sc(self.conv_sc(x))
        return self.relu(y + sc)


class TorchResNet50(tnn.Module):
    # keras_vggface stem: TF-'SAME' conv1 (asymmetric (2,3) padding at
    # even inputs) and a VALID max pool — NOT torchvision's symmetric
    # pad-3 conv + padded pool.
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=0, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-3)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2)
        blocks = []
        cin = 64
        for stage, (n, f) in enumerate(zip((3, 4, 6, 3),
                                           (64, 128, 256, 512))):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(TorchBottleneck(cin, f, stride=stride,
                                              project=(b == 0)))
                cin = 4 * f
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        x = torch.nn.functional.pad(x, (2, 3, 2, 3))  # TF 'SAME', k7 s2
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for blk in self.blocks:
            x = blk(x)
        return x.mean(dim=(2, 3))  # global average pool -> (N, 2048)


def _port_conv(tconv):
    # torch OIHW -> flax HWIO
    return jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))


def _port_bn(tbn):
    return {
        "gamma": jnp.asarray(tbn.weight.detach().numpy()),
        "beta": jnp.asarray(tbn.bias.detach().numpy()),
        "mean": jnp.asarray(tbn.running_mean.detach().numpy()),
        "var": jnp.asarray(tbn.running_var.detach().numpy()),
    }


def _port_params(tmodel, flax_params):
    p = dict(flax_params["params"])
    p["Conv_0"] = {"kernel": _port_conv(tmodel.conv1)}
    p["_FrozenBN_0"] = _port_bn(tmodel.bn1)
    for i, blk in enumerate(tmodel.blocks):
        bp = {
            "Conv_0": {"kernel": _port_conv(blk.conv1)},
            "_FrozenBN_0": _port_bn(blk.bn1),
            "Conv_1": {"kernel": _port_conv(blk.conv2)},
            "_FrozenBN_1": _port_bn(blk.bn2),
            "Conv_2": {"kernel": _port_conv(blk.conv3)},
            "_FrozenBN_2": _port_bn(blk.bn3),
        }
        if blk.project:
            bp["Conv_3"] = {"kernel": _port_conv(blk.conv_sc)}
            bp["_FrozenBN_3"] = _port_bn(blk.bn_sc)
        p[f"_Bottleneck_{i}"] = bp
    return {"params": p}


def test_resnet50_matches_torch_reference():
    torch.manual_seed(0)
    tmodel = TorchResNet50().eval()
    # Random-but-nontrivial BN stats so the test exercises them.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    model = VGGFaceResNet50(dtype=jnp.float32)
    flax_init = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = _port_params(tmodel, flax_init)
    # Structure must match exactly (same layer inventory).
    assert (jax.tree.structure(params) == jax.tree.structure(flax_init))

    x = np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


class TorchIRUnit(tnn.Module):
    """LResNetE improved-residual unit mirroring models/arcface._IRUnit."""

    def __init__(self, cin, f, stride=1):
        super().__init__()
        self.bn0 = tnn.BatchNorm2d(cin, eps=2e-5)
        self.conv1 = tnn.Conv2d(cin, f, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(f, eps=2e-5)
        self.prelu = tnn.PReLU(f)
        self.conv2 = tnn.Conv2d(f, f, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(f, eps=2e-5)
        self.project = stride != 1 or cin != f
        if self.project:
            self.conv_sc = tnn.Conv2d(cin, f, 1, stride=stride, bias=False)
            self.bn_sc = tnn.BatchNorm2d(f, eps=2e-5)

    def forward(self, x):
        y = self.bn0(x)
        y = self.prelu(self.bn1(self.conv1(y)))
        y = self.bn2(self.conv2(y))
        sc = self.bn_sc(self.conv_sc(x)) if self.project else x
        return y + sc


class TorchArcFaceTiny(tnn.Module):
    """ArcFaceResNet100 topology at stage_sizes (1, 1, 1, 1).

    ``with_fc1_bn`` adds the real model's fc1 output BatchNorm1d
    (face_model.py:28-41's ``fc1`` layer) so the converter's
    fold-into-affine formula can be validated against torch.
    """

    def __init__(self, embed=32, with_fc1_bn=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=2e-5)
        self.prelu = tnn.PReLU(64)
        units = []
        cin = 64
        for f in (64, 128, 256, 512):
            units.append(TorchIRUnit(cin, f, stride=2))
            cin = f
        self.units = tnn.ModuleList(units)
        self.bn_out = tnn.BatchNorm2d(512, eps=2e-5)
        self.fc = tnn.Linear(512 * 7 * 7, embed)
        self.bn_fc1 = tnn.BatchNorm1d(embed, eps=2e-5) if with_fc1_bn \
            else None

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for u in self.units:
            x = u(x)
        x = self.bn_out(x)
        # Flax flattens NHWC; match that ordering: NCHW -> NHWC -> flat.
        x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        x = self.fc(x)
        if self.bn_fc1 is not None:
            x = self.bn_fc1(x)
        return torch.nn.functional.normalize(x, dim=-1)


def _port_prelu(tp):
    return {"alpha": jnp.asarray(tp.weight.detach().numpy())}


def _randomize_bn_stats(tm):
    """Randomize BN running stats (call with the global RNG seeded —
    module CONSTRUCTION must also happen under a seed so conv/fc weights
    are reproducible per run)."""
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def _port_arcface_tiny(tm, model, init):
    """Port TorchArcFaceTiny weights onto ArcFaceResNet100 params."""
    p = dict(init["params"])
    p["Conv_0"] = {"kernel": _port_conv(tm.conv1)}
    p["_FrozenBN_0"] = _port_bn(tm.bn1)
    p["_PReLU_0"] = _port_prelu(tm.prelu)
    for i, u in enumerate(tm.units):
        up = {
            "_FrozenBN_0": _port_bn(u.bn0),
            "Conv_0": {"kernel": _port_conv(u.conv1)},
            "_FrozenBN_1": _port_bn(u.bn1),
            "_PReLU_0": _port_prelu(u.prelu),
            "Conv_1": {"kernel": _port_conv(u.conv2)},
            "_FrozenBN_2": _port_bn(u.bn2),
        }
        if u.project:
            up["Conv_2"] = {"kernel": _port_conv(u.conv_sc)}
            up["_FrozenBN_3"] = _port_bn(u.bn_sc)
        p[f"_IRUnit_{i}"] = up
    p["_FrozenBN_1"] = _port_bn(tm.bn_out)
    p["Dense_0"] = {
        "kernel": jnp.asarray(tm.fc.weight.detach().numpy().T),
        "bias": jnp.asarray(tm.fc.bias.detach().numpy()),
    }
    if tm.bn_fc1 is None:
        # No output BN in the mirror: the model's affine is identity.
        p["fc1_gamma"] = jnp.ones_like(init["params"]["fc1_gamma"])
        p["fc1_beta"] = jnp.zeros_like(init["params"]["fc1_beta"])
    else:
        # The converter's fold (tools/convert_mxnet.py:247-252):
        # gamma' = g / sqrt(v + eps), beta' = b - m * gamma'.
        bn = tm.bn_fc1
        g = bn.weight.detach().numpy()
        b = bn.bias.detach().numpy()
        m = bn.running_mean.detach().numpy()
        v = bn.running_var.detach().numpy()
        scale = g / np.sqrt(v + bn.eps)
        p["fc1_gamma"] = jnp.asarray(scale, jnp.float32)
        p["fc1_beta"] = jnp.asarray(b - m * scale, jnp.float32)
    return {"params": p}


def test_arcface_ir_topology_matches_torch():
    from alink_tpu.models import ArcFaceResNet100

    torch.manual_seed(1)
    tm = TorchArcFaceTiny().eval()
    _randomize_bn_stats(tm)
    model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1), embedding_dim=32,
                             dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 112, 112, 3), jnp.float32))
    params = _port_arcface_tiny(tm, model, init)
    assert jax.tree.structure(params) == jax.tree.structure(init)

    x = np.random.default_rng(1).uniform(0, 255, (2, 112, 112, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_arcface_fc1_bn_fold_matches_torch():
    """The real LResNet100E-II ends Dense -> BatchNorm1d -> L2
    (face_model.py:28-41); the flax model carries the BN as a folded
    affine.  Validate the converter's fold formula against torch's
    BatchNorm1d with random running stats — the identity-BN shortcut of
    the topology test never exercises it."""
    from alink_tpu.models import ArcFaceResNet100

    torch.manual_seed(3)
    tm = TorchArcFaceTiny(with_fc1_bn=True).eval()
    _randomize_bn_stats(tm)
    model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1), embedding_dim=32,
                             dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 112, 112, 3), jnp.float32))
    params = _port_arcface_tiny(tm, model, init)

    x = np.random.default_rng(2).uniform(0, 255, (2, 112, 112, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_arcface_ir_stage_with_identity_shortcuts_matches_torch():
    """Deeper-stage coverage: stride-1 IR units with *identity* shortcuts
    (the (3, 13, 30, 3) net is mostly these; the tiny test above only
    exercises projecting stride-2 units)."""
    from alink_tpu.models import ArcFaceResNet100

    torch.manual_seed(3)

    class TorchArcFaceTwoPerStage(tnn.Module):
        def __init__(self, embed=16):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 3, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(64, eps=2e-5)
            self.prelu = tnn.PReLU(64)
            units = []
            cin = 64
            for f in (64, 128, 256, 512):
                units.append(TorchIRUnit(cin, f, stride=2))
                units.append(TorchIRUnit(f, f, stride=1))  # identity sc
                cin = f
            self.units = tnn.ModuleList(units)
            self.bn_out = tnn.BatchNorm2d(512, eps=2e-5)
            self.fc = tnn.Linear(512 * 4 * 4, embed)

        def forward(self, x):
            x = self.prelu(self.bn1(self.conv1(x)))
            for u in self.units:
                x = u(x)
            x = self.bn_out(x)
            x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
            x = self.fc(x)
            return torch.nn.functional.normalize(x, dim=-1)

    tm = TorchArcFaceTwoPerStage().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    model = ArcFaceResNet100(stage_sizes=(2, 2, 2, 2), embedding_dim=16,
                             dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    p = dict(init["params"])
    p["Conv_0"] = {"kernel": _port_conv(tm.conv1)}
    p["_FrozenBN_0"] = _port_bn(tm.bn1)
    p["_PReLU_0"] = _port_prelu(tm.prelu)
    for i, u in enumerate(tm.units):
        up = {
            "_FrozenBN_0": _port_bn(u.bn0),
            "Conv_0": {"kernel": _port_conv(u.conv1)},
            "_FrozenBN_1": _port_bn(u.bn1),
            "_PReLU_0": _port_prelu(u.prelu),
            "Conv_1": {"kernel": _port_conv(u.conv2)},
            "_FrozenBN_2": _port_bn(u.bn2),
        }
        if u.project:
            up["Conv_2"] = {"kernel": _port_conv(u.conv_sc)}
            up["_FrozenBN_3"] = _port_bn(u.bn_sc)
        p[f"_IRUnit_{i}"] = up
    p["_FrozenBN_1"] = _port_bn(tm.bn_out)
    p["Dense_0"] = {
        "kernel": jnp.asarray(tm.fc.weight.detach().numpy().T),
        "bias": jnp.asarray(tm.fc.bias.detach().numpy()),
    }
    p["fc1_gamma"] = jnp.ones_like(init["params"]["fc1_gamma"])
    p["fc1_beta"] = jnp.zeros_like(init["params"]["fc1_beta"])
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(init)

    x = np.random.default_rng(3).uniform(0, 255, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


# ---------------------------------------------------------------------------
# SENet50 (keras_vggface senet50 topology: code/model.py:126-141)
# ---------------------------------------------------------------------------


class TorchSEBottleneck(tnn.Module):
    def __init__(self, cin, f, stride=1, project=False, reduction=16):
        super().__init__()
        self.project = project
        self.conv1 = tnn.Conv2d(cin, f, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(f, eps=1e-3)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(f, eps=1e-3)
        self.conv3 = tnn.Conv2d(f, 4 * f, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(4 * f, eps=1e-3)
        self.fc1 = tnn.Linear(4 * f, 4 * f // reduction)
        self.fc2 = tnn.Linear(4 * f // reduction, 4 * f)
        if project:
            self.conv_sc = tnn.Conv2d(cin, 4 * f, 1, stride=stride,
                                      bias=False)
            self.bn_sc = tnn.BatchNorm2d(4 * f, eps=1e-3)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        se = y.mean(dim=(2, 3))
        se = torch.sigmoid(self.fc2(torch.relu(self.fc1(se))))
        y = y * se[:, :, None, None]
        sc = self.bn_sc(self.conv_sc(x)) if self.project else x
        return torch.relu(y + sc)


class TorchSENet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=0, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-3)
        self.maxpool = tnn.MaxPool2d(3, stride=2)
        blocks = []
        cin = 64
        for stage, (n, f) in enumerate(zip((3, 4, 6, 3),
                                           (64, 128, 256, 512))):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(TorchSEBottleneck(cin, f, stride=stride,
                                                project=(b == 0)))
                cin = 4 * f
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        x = torch.nn.functional.pad(x, (2, 3, 2, 3))  # TF 'SAME', k7 s2
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for blk in self.blocks:
            x = blk(x)
        return x.mean(dim=(2, 3))


def _port_dense(tlin):
    return {"kernel": jnp.asarray(tlin.weight.detach().numpy().T),
            "bias": jnp.asarray(tlin.bias.detach().numpy())}


def test_senet50_matches_torch_reference():
    """SE gate conventions (post-bn3 pre-add, f32 MLP, reduction 16)
    asserted against an independent PyTorch build of the topology."""
    from alink_tpu.models import SENet50

    torch.manual_seed(1)
    tmodel = TorchSENet50().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    model = SENet50(dtype=jnp.float32)
    flax_init = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    p = dict(flax_init["params"])
    p["Conv_0"] = {"kernel": _port_conv(tmodel.conv1)}
    p["_FrozenBN_0"] = _port_bn(tmodel.bn1)
    for i, blk in enumerate(tmodel.blocks):
        bp = {
            "Conv_0": {"kernel": _port_conv(blk.conv1)},
            "_FrozenBN_0": _port_bn(blk.bn1),
            "Conv_1": {"kernel": _port_conv(blk.conv2)},
            "_FrozenBN_1": _port_bn(blk.bn2),
            "Conv_2": {"kernel": _port_conv(blk.conv3)},
            "_FrozenBN_2": _port_bn(blk.bn3),
            "Dense_0": _port_dense(blk.fc1),
            "Dense_1": _port_dense(blk.fc2),
        }
        if blk.project:
            bp["Conv_3"] = {"kernel": _port_conv(blk.conv_sc)}
            bp["_FrozenBN_3"] = _port_bn(blk.bn_sc)
        p[f"_SEBottleneck_{i}"] = bp
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(flax_init)

    x = np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# VGGFace16 (keras_vggface vgg16 topology: code/siamese.py:187-200)
# ---------------------------------------------------------------------------


class TorchVGG16(tnn.Module):
    def __init__(self):
        super().__init__()
        convs = []
        cin = 3
        for widths in ((64, 64), (128, 128), (256, 256, 256),
                       (512, 512, 512), (512, 512, 512)):
            for w in widths:
                convs.append(tnn.Conv2d(cin, w, 3, padding=1))
                cin = w
        self.convs = tnn.ModuleList(convs)
        self.group_sizes = [2, 2, 3, 3, 3]

    def forward(self, x):
        i = 0
        for n in self.group_sizes:
            for _ in range(n):
                x = torch.relu(self.convs[i](x))
                i += 1
            x = torch.max_pool2d(x, 2, stride=2)
        return x.flatten(1)


def test_vgg16_matches_torch_reference():
    from alink_tpu.models import VGGFace16

    torch.manual_seed(2)
    tmodel = TorchVGG16().eval()
    model = VGGFace16(dtype=jnp.float32)
    flax_init = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    p = dict(flax_init["params"])
    for i, conv in enumerate(tmodel.convs):
        p[f"Conv_{i}"] = {"kernel": _port_conv(conv),
                          "bias": jnp.asarray(conv.bias.detach().numpy())}
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(flax_init)

    # 64 input -> 2x2x512 pool5 grid, so the flatten-order assertion is
    # non-trivial: Keras/flax flatten NHWC (the reference's channels_last
    # Flatten, siamese.py:190), torch flattens NCHW — transpose torch's
    # grid into NHWC before comparing.
    x = np.random.default_rng(2).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    want = want.reshape(2, 512, 2, 2).transpose(0, 2, 3, 1).reshape(2, -1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# SmallRes student tower (code/siamese.py:139-156)
# ---------------------------------------------------------------------------


class TorchSmallResTower(tnn.Module):
    def __init__(self, in_hw, feature_dim=64):
        super().__init__()
        self.c1 = tnn.Conv2d(3, 32, 3, padding=1)
        self.c2 = tnn.Conv2d(32, 32, 3)          # valid
        self.c3 = tnn.Conv2d(32, 64, 3, padding=1)
        self.c4 = tnn.Conv2d(64, 64, 3)          # valid
        s = (in_hw - 2) // 2
        s = (s - 2) // 2
        self.fc = tnn.Linear(64 * s * s, feature_dim)
        self._grid = s

    def forward(self, x):
        x = torch.relu(self.c2(torch.relu(self.c1(x))))
        x = torch.max_pool2d(x, 2, 2)
        x = torch.relu(self.c4(torch.relu(self.c3(x))))
        x = torch.max_pool2d(x, 2, 2)
        # NHWC flatten (Keras channels_last) before the dense.
        x = x.permute(0, 2, 3, 1).flatten(1)
        return torch.relu(self.fc(x))


def test_smallres_tower_matches_torch_reference():
    """SAME/VALID padding mix, pool placement and the channels_last
    flatten of the student tower, vs an independent torch build."""
    from alink_tpu.models.siamese import SmallResTower

    torch.manual_seed(3)
    hw = 20
    tmodel = TorchSmallResTower(hw, feature_dim=64).eval()
    model = SmallResTower(feature_dim=64, dtype=jnp.float32)
    flax_init = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw, hw, 3), jnp.float32))
    p = dict(flax_init["params"])
    for i, conv in enumerate((tmodel.c1, tmodel.c2, tmodel.c3, tmodel.c4)):
        p[f"Conv_{i}"] = {"kernel": _port_conv(conv),
                          "bias": jnp.asarray(conv.bias.detach().numpy())}
    p["Dense_0"] = _port_dense(tmodel.fc)
    params = {"params": p}
    assert jax.tree.structure(params) == jax.tree.structure(flax_init)

    x = np.random.default_rng(3).normal(0, 1, (2, hw, hw, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
