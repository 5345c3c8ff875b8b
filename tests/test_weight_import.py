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


import pytest
import jax

from sihl_tpu.backbones import Backbone, _FEATURE_FACTORIES
from sihl_tpu.backbones.torchvision_import import dump_state_dict


# one representative per torchvision family + structurally distinct variants
ROUNDTRIP_ARCHS = [
    "resnet18",          # BasicBlock
    "resnet50",          # Bottleneck + downsample
    "efficientnet_b0",   # MBConv w/ SE, expand==1 first stage
    "efficientnet_v2_s", # FusedMBConv stages
    "mobilenet_v2",      # bare projection conv+bn tail
    "mobilenet_v3_small",# SE + first block without expand
    "mobilenet_v3_large",
    "convnext_tiny",     # LN/Linear blocks + layer_scale
    "densenet121",       # denseblock/denselayer naming
    "shufflenet_v2_x0_5",# two-branch units
    "mnasnet0_5",        # flat layers.{i} indexing
]


@pytest.mark.parametrize("name", ROUNDTRIP_ARCHS)
def test_dump_load_roundtrip_all_families(name):
    """dump_state_dict(A) -> load_state_dict(B) must make B's parameters
    (and BN running stats) bitwise equal to A's."""
    feat_a = _FEATURE_FACTORIES[name](name, input_channels=3, rngs=nnx.Rngs(0))
    feat_b = _FEATURE_FACTORIES[name](name, input_channels=3, rngs=nnx.Rngs(1))

    sd = dump_state_dict(feat_a, name)
    assert len(sd) > 20
    load_state_dict(feat_b, name, sd)  # raises on unconsumed keys

    state_a = nnx.state(feat_a)
    state_b = nnx.state(feat_b)
    leaves_a = jax.tree_util.tree_leaves(state_a)
    leaves_b = jax.tree_util.tree_leaves(state_b)
    assert len(leaves_a) == len(leaves_b)
    diff = [
        i
        for i, (a, b) in enumerate(zip(leaves_a, leaves_b))
        if a.shape != b.shape or not np.array_equal(np.asarray(a), np.asarray(b))
    ]
    assert not diff, f"{len(diff)} param leaves differ after roundtrip"


_MANIFEST_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "fixtures", "tv_manifests"
)


def _manifest_names():
    import os

    if not os.path.isdir(_MANIFEST_DIR):  # pragma: no cover
        return []
    names = sorted(f[:-5] for f in os.listdir(_MANIFEST_DIR) if f.endswith(".json"))
    if os.environ.get("SIHL_TPU_FULL_MANIFEST_CHECK") == "1":
        return names
    # default: one representative per family (full sweep takes ~10 min of
    # pure module construction; enable with SIHL_TPU_FULL_MANIFEST_CHECK=1)
    return [n for n in names if n in ROUNDTRIP_ARCHS]


@pytest.mark.parametrize("name", _manifest_names())
def test_walker_matches_committed_manifest(name):
    """The walker must emit exactly the committed per-arch key+shape
    manifest (tools/gen_tv_manifests.py).  The manifests are the auditable
    record of the torchvision layout the importer expects — a walker change
    that silently renames or reshapes a key fails here."""
    import json
    import os

    with open(os.path.join(_MANIFEST_DIR, f"{name}.json")) as f:
        manifest = json.load(f)
    feat = _FEATURE_FACTORIES[name](name, input_channels=3, rngs=nnx.Rngs(0))
    sd = dump_state_dict(feat, name)
    got = {k: list(v.shape) for k, v in sd.items()}
    assert got == manifest, (
        f"{name}: walker layout drifted from committed manifest "
        f"(+{sorted(set(got) - set(manifest))[:5]} "
        f"-{sorted(set(manifest) - set(got))[:5]})"
    )


def test_load_rejects_shape_mismatch():
    """A torchvision tensor with the right key but wrong shape must raise
    naming the offending key — not silently assign."""
    feat = _FEATURE_FACTORIES["resnet18"]("resnet18", input_channels=3, rngs=nnx.Rngs(0))
    sd = dump_state_dict(feat, "resnet18")
    sd["layer1.0.conv1.weight"] = np.zeros((64, 64, 5, 5), np.float32)
    with pytest.raises(RuntimeError, match="layer1.0.conv1.weight"):
        load_state_dict(feat, "resnet18", sd)


def test_load_rejects_layout_mismatch():
    feat = _FEATURE_FACTORIES["mnasnet0_5"]("mnasnet0_5", input_channels=3, rngs=nnx.Rngs(0))
    sd = dump_state_dict(feat, "mnasnet0_5")
    sd["layers.99.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(RuntimeError, match="unconsumed"):
        load_state_dict(feat, "mnasnet0_5", sd)


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
        np.asarray(features.stem.conv.kernel[...]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    after = np.asarray(features(x)[0])
    assert not np.allclose(before, after), "weights did not change the forward"
