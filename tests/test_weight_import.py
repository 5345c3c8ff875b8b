"""Weight-import plumbing: a synthetic torchvision-format state dict maps
onto the native resnet and changes its forward output accordingly."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.backbones.resnet import make_resnet_features
from sihl_tpu.backbones.torchvision_import import load_state_dict


def synthetic_resnet18_state_dict(rng):
    """Keys/shapes as torchvision resnet18 produces them (OIHW convs)."""
    sd = {
        "conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05,
        "bn1.weight": np.ones(64, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.zeros(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32),
    }
    layer_planes = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for i, (cin, planes) in enumerate(layer_planes, start=1):
        for j in range(2):
            pre = f"layer{i}.{j}"
            c_in = cin if j == 0 else planes
            sd[f"{pre}.conv1.weight"] = rng.randn(planes, c_in, 3, 3).astype(np.float32) * 0.05
            sd[f"{pre}.conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32) * 0.05
            for k in (1, 2):
                sd[f"{pre}.bn{k}.weight"] = np.ones(planes, np.float32)
                sd[f"{pre}.bn{k}.bias"] = np.zeros(planes, np.float32)
                sd[f"{pre}.bn{k}.running_mean"] = np.zeros(planes, np.float32)
                sd[f"{pre}.bn{k}.running_var"] = np.ones(planes, np.float32)
            if j == 0 and i > 1:
                sd[f"{pre}.downsample.0.weight"] = (
                    rng.randn(planes, cin, 1, 1).astype(np.float32) * 0.05
                )
                sd[f"{pre}.downsample.1.weight"] = np.ones(planes, np.float32)
                sd[f"{pre}.downsample.1.bias"] = np.zeros(planes, np.float32)
                sd[f"{pre}.downsample.1.running_mean"] = np.zeros(planes, np.float32)
                sd[f"{pre}.downsample.1.running_var"] = np.ones(planes, np.float32)
    return sd


def test_resnet18_state_dict_roundtrip():
    rng = np.random.RandomState(0)
    sd = synthetic_resnet18_state_dict(rng)
    features = make_resnet_features("resnet18", rngs=nnx.Rngs(0))
    features.eval()
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    before = np.asarray(features(x)[0])

    load_state_dict(features, "resnet18", sd)
    # kernel is OIHW -> HWIO transposed
    np.testing.assert_allclose(
        np.asarray(features.stem.conv.kernel.value),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    after = np.asarray(features(x)[0])
    assert not np.allclose(before, after), "weights did not change the forward"
