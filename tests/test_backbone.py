"""Backbone pyramid-contract tests (mirrors reference
``tests/test_torchvision_backbone.py``)."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from sihl_tpu import Backbone, TimmBackbone


@pytest.mark.parametrize(
    "name",
    [
        "resnet18",
        "resnet50",
        "resnext50_32x4d",
        "wide_resnet50_2",
        "efficientnet_b0",
        "efficientnet_v2_s",
        "mobilenet_v2",
        "mobilenet_v3_large",
        "mobilenet_v3_small",
        "convnext_tiny",
        "densenet121",
        "densenet201",
        "shufflenet_v2_x1_0",
        "mnasnet1_0",
        "dla34",
        "dla60",
        "hrnet_w18",
        "mobilenetv4_conv_small",
        "mobilenetv4_conv_medium",
        "mobilenetv4_hybrid_medium",
    ],
)
def test_pyramid_contract(name):
    backbone = Backbone(name, rngs=nnx.Rngs(0))
    x = jnp.ones((1, 64, 64, 3))
    outs = backbone(x)
    assert len(outs) == 6  # input + levels 1..5
    assert len(backbone.out_channels) == 6
    assert backbone.out_channels[0] == 3
    for level, out in enumerate(outs):
        assert out.shape[1] == 64 // 2**level
        assert out.shape[2] == 64 // 2**level
        assert out.shape[3] == backbone.out_channels[level]


def test_grayscale_input():
    backbone = Backbone("resnet18", input_channels=1, rngs=nnx.Rngs(0))
    outs = backbone(jnp.ones((1, 64, 64, 1)))
    assert backbone.out_channels[0] == 1
    assert outs[0].shape[-1] == 1


def test_multispectral_input():
    backbone = Backbone("resnet18", input_channels=7, rngs=nnx.Rngs(0))
    outs = backbone(jnp.ones((1, 64, 64, 7)))
    assert outs[1].shape == (1, 32, 32, 64)


def test_top_level_7():
    backbone = Backbone("resnet18", top_level=7, rngs=nnx.Rngs(0))
    outs = backbone(jnp.ones((1, 128, 128, 3)))
    assert len(outs) == 8
    assert outs[7].shape == (1, 1, 1, backbone.out_channels[7])


def test_bad_name():
    with pytest.raises(ValueError):
        Backbone("not_a_real_arch")


def test_indivisible_input_asserts():
    backbone = Backbone("resnet18", rngs=nnx.Rngs(0))
    with pytest.raises(AssertionError):
        backbone(jnp.ones((1, 50, 50, 3)))


def test_timm_alias():
    backbone = TimmBackbone("resnet18", rngs=nnx.Rngs(0))
    outs = backbone(jnp.ones((1, 64, 64, 3)))
    assert len(outs) == 6
    with pytest.raises(ValueError):
        TimmBackbone("not_a_real_arch")


def test_every_reference_timm_name_resolves():
    """All active names in the reference registry
    (``src/sihl/timm_backbone.py:13-89``) must construct without
    ValueError — including the width-multiplier mobilenet variants."""
    import re

    from sihl_tpu.backbones import _TIMM_ALIASES

    src = open("/root/reference/src/sihl/timm_backbone.py").read()
    block = src[src.index("TIMM_BACKBONE_NAMES") :]
    block = block[: block.index(")\n")]
    names = re.findall(r'^\s+"([a-z0-9_]+)",', block, re.M)
    assert len(names) >= 55, names
    missing = [n for n in names if n not in _TIMM_ALIASES]
    assert not missing, missing


@pytest.mark.parametrize(
    "name,channels",
    [
        # torchvision/timm make_divisible(c*w, 8) channel math
        ("mobilenetv2_050", [3, 8, 16, 16, 48, 1280]),
        ("mobilenetv2_140", [3, 24, 32, 48, 136, 1792]),
        ("mobilenetv3_small_050", [3, 8, 8, 16, 24, 288]),
        ("mobilenetv3_small_075", [3, 16, 16, 24, 40, 432]),
    ],
)
def test_mobilenet_width_variants(name, channels):
    backbone = TimmBackbone(name, rngs=nnx.Rngs(0))
    assert backbone.out_channels == channels
    outs = backbone(jnp.ones((1, 64, 64, 3)))
    for lvl, (o, c) in enumerate(zip(outs, channels)):
        assert o.shape == (1, 64 // 2**lvl, 64 // 2**lvl, c)


def test_mobilenetv4_final_conv_channels():
    """timm's mnv4 blocks end with a 1x1 960-ch conv, so the stride-32
    feature is 960 channels in every variant (features_only semantics)."""
    from sihl_tpu.backbones.mobilenetv4 import MOBILENETV4_CONFIGS

    for name, spec in MOBILENETV4_CONFIGS.items():
        assert spec[-1] == ("conv", 960, 1, 1), name


def test_stem_space_to_depth_parity():
    """The s2d-rewritten stem conv must equal the direct 7x7/s2 conv."""
    import jax
    import numpy as np

    from sihl_tpu.backbones.resnet import _stem_space_to_depth

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    w = jnp.asarray(rng.randn(7, 7, 3, 8), jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    s2d = _stem_space_to_depth(x, w)
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct), atol=1e-4)


def test_stem_batch_fold_parity():
    """The batch-folded stem conv must be bit-exact vs the direct conv
    (same contraction order, only the batch axis is regrouped), including
    its gradients, at several geometries."""
    import jax
    import numpy as np

    from sihl_tpu.backbones.resnet import _stem_batch_fold

    rng = np.random.RandomState(0)
    for b, h, wdt in [(2, 32, 32), (1, 64, 32), (16, 16, 16)]:
        x = jnp.asarray(rng.randn(b, h, wdt, 3), jnp.float32)
        w = jnp.asarray(rng.randn(7, 7, 3, 8), jnp.float32)

        def direct_fn(w):
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        direct = direct_fn(w)
        folded = _stem_batch_fold(x, w)
        assert folded is not None and folded.shape == direct.shape, (b, h, wdt)
        np.testing.assert_array_equal(np.asarray(folded), np.asarray(direct))
        # gradient parity (the fold is used under autodiff when unfrozen)
        g_direct = jax.grad(lambda w: jnp.sum(direct_fn(w) ** 2))(w)
        g_fold = jax.grad(lambda w: jnp.sum(_stem_batch_fold(x, w) ** 2))(w)
        # the fold's wrt-filter grad accumulates per-group partials in a
        # different order than the direct conv — f32 tolerance, not exact
        np.testing.assert_allclose(
            np.asarray(g_fold), np.asarray(g_direct), rtol=2e-4, atol=1e-3
        )


def test_stage1_s2d_parity():
    """The space-to-depth stage-1 execution must match the plain stage:
    forward output, parameter gradients, and BN running-stat updates."""
    import jax
    import numpy as np
    from flax import nnx

    from sihl_tpu.backbones.resnet import (
        Bottleneck,
        _Stage,
        _stage_s2d,
        _stage_s2d_eligible,
    )

    rngs = nnx.Rngs(0)
    stage = _Stage(Bottleneck, 64, 16, 3, 1, 1, 64, rngs)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 12, 64), jnp.float32)
    assert _stage_s2d_eligible(stage, x)

    other = nnx.clone(stage)
    stage.train()
    other.train()

    va, ga = nnx.value_and_grad(lambda st, x: (st(x) ** 2).sum())(stage, x)
    vb, gb = nnx.value_and_grad(lambda st, x: (_stage_s2d(st, x) ** 2).sum())(
        other, x
    )
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(nnx.state(ga)),
        jax.tree_util.tree_leaves(nnx.state(gb)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=1e-4)

    # the value_and_grad calls above ran both stages once in train mode;
    # their running-stat updates must agree
    for a, b in zip(
        jax.tree_util.tree_leaves(nnx.state(stage, nnx.BatchStat)),
        jax.tree_util.tree_leaves(nnx.state(other, nnx.BatchStat)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    stage.eval()
    other.eval()
    np.testing.assert_allclose(
        np.asarray(_stage_s2d(other, x)), np.asarray(stage(x)), atol=1e-5
    )


def test_stage1_s2d_ineligible_cases():
    """BasicBlock stages and odd heights fall back to the plain path."""
    import numpy as np
    from flax import nnx

    from sihl_tpu.backbones.resnet import BasicBlock, _Stage, _stage_s2d_eligible

    rngs = nnx.Rngs(0)
    basic = _Stage(BasicBlock, 64, 64, 2, 1, 1, 64, rngs)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 64), jnp.float32)
    assert not _stage_s2d_eligible(basic, x)

    from sihl_tpu.backbones.resnet import Bottleneck

    stage = _Stage(Bottleneck, 64, 16, 1, 1, 1, 64, rngs)
    x_odd = jnp.asarray(np.random.RandomState(0).randn(1, 15, 16, 64), jnp.float32)
    assert not _stage_s2d_eligible(stage, x_odd)


def test_frozen_levels_paths():
    backbone = Backbone("resnet18", pretrained=False, frozen_levels=2, rngs=nnx.Rngs(0))
    # not pretrained -> freezing is a no-op, like the reference (:158-159)
    assert backbone.frozen_levels == 0

    backbone.frozen_levels = 2  # simulate pretrained freezing
    frozen = backbone.frozen_attr_names()
    assert frozen == ["stem", "layer1"]
    assert backbone.is_frozen_param(("stem", "conv", "kernel"))
    assert not backbone.is_frozen_param(("layer4", "blocks", 0))

    backbone.frozen_levels = -1
    assert "layer4" in backbone.frozen_attr_names()


@pytest.mark.parametrize(
    "name,expect_lvl1",
    [
        ("dla34", "base"),
        ("hrnet_w18", "conv1"),
        ("mobilenetv4_conv_small", "stem"),
    ],
)
def test_frozen_levels_new_families(name, expect_lvl1):
    """level_modules lists for the round-2 families address real modules
    and cover every level exactly once."""
    backbone = Backbone(name, rngs=nnx.Rngs(0))
    feats = backbone.features
    assert len(feats.level_modules) == 5
    for level in feats.level_modules:
        for entry in level:
            if isinstance(entry, tuple):
                attr, idx = entry
                assert len(getattr(feats, attr)) > idx, entry
            else:
                assert hasattr(feats, entry), entry
    backbone.frozen_levels = 1
    frozen = backbone.frozen_attr_names()
    assert expect_lvl1 in [e if isinstance(e, str) else e[0] for e in frozen]
    backbone.frozen_levels = -1
    all_names = backbone.frozen_attr_names()
    assert len(all_names) >= 5
