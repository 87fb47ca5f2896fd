"""ResNet-18 torch-checkpoint converter: structural contract vs the flax
init tree, and golden forward parity vs an independent torch functional
implementation of torchvision's resnet18 feature path (reference birds
encoder wraps resnet18(pretrained=True), models/model.py:16-21)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disentangle_mlp_tpu.models.resnet import (
    ResNet18Features, load_torch_checkpoint, load_torch_state_dict)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def make_torch_state_dict(seed=0):
    """Random tensors in torchvision resnet18's exact key/shape layout."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(
            size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for layer, c in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            pre = f"layer{layer}.{b}"
            c_in = cin if b == 0 else c
            conv(f"{pre}.conv1", c, c_in, 3)
            bn(f"{pre}.bn1", c)
            conv(f"{pre}.conv2", c, c, 3)
            bn(f"{pre}.bn2", c)
            if b == 0 and layer > 1:
                conv(f"{pre}.downsample.0", c, c_in, 1)
                bn(f"{pre}.downsample.1", c)
        cin = c
    # classifier keys exist in real checkpoints and must be ignored
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    return sd


def torch_resnet18_features(sd, x_nchw):
    """Eval-mode functional forward of torchvision resnet18 up to the
    global average pool, straight off the state dict."""
    t = lambda k: torch.from_numpy(sd[k])

    def cbn(x, c, b, stride, pad):
        x = F.conv2d(x, t(f"{c}.weight"), None, stride, pad)
        return F.batch_norm(
            x, t(f"{b}.running_mean"), t(f"{b}.running_var"),
            t(f"{b}.weight"), t(f"{b}.bias"), False, 0.1, 1e-5)

    x = F.relu(cbn(x_nchw, "conv1", "bn1", 2, 3))
    x = F.max_pool2d(x, 3, 2, 1)
    for layer, _c in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            pre = f"layer{layer}.{b}"
            stride = 2 if (layer > 1 and b == 0) else 1
            identity = x
            out = F.relu(cbn(x, f"{pre}.conv1", f"{pre}.bn1", stride, 1))
            out = cbn(out, f"{pre}.conv2", f"{pre}.bn2", 1, 1)
            if f"{pre}.downsample.0.weight" in sd:
                identity = cbn(x, f"{pre}.downsample.0",
                               f"{pre}.downsample.1", stride, 0)
            x = F.relu(out + identity)
    return x.mean(dim=(2, 3)).numpy()


def test_converted_tree_matches_init_tree():
    sd = make_torch_state_dict()
    variables = load_torch_state_dict(sd)
    model = ResNet18Features()
    init = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                      train=False)
    for col in ("params", "batch_stats"):
        got = jax.tree.map(jnp.shape, variables[col])
        want = jax.tree.map(jnp.shape, jax.device_get(init[col]))
        assert jax.tree_util.tree_structure(got) == \
            jax.tree_util.tree_structure(want)
        assert got == jax.device_get(want)


def test_forward_parity_vs_torch():
    sd = make_torch_state_dict(seed=1)
    variables = load_torch_state_dict(sd)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        want = torch_resnet18_features(sd, torch.from_numpy(x))

    model = ResNet18Features()
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_load_torch_checkpoint_file(tmp_path):
    sd = make_torch_state_dict(seed=3)
    path = tmp_path / "resnet18.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    variables = load_torch_checkpoint(str(path))
    assert variables is not None
    assert "BasicBlock_7" in variables["params"]
    assert load_torch_checkpoint(str(tmp_path / "missing.pth")) is None
