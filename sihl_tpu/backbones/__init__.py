"""Backbone factories and registry.

``TorchvisionBackbone`` / ``TimmBackbone`` mirror the reference wrappers
(``src/sihl/torchvision_backbone.py:101``, ``src/sihl/timm_backbone.py:92``)
but build *native* NNX feature nets — there is no torch in the compute path.
``pretrained=True`` ports torchvision weights (CPU torch used only as a
weight file reader at construction time).

Both factories also accept ``freeze_batchnorms`` (the reference's timm path
advertised but broke this flag — SURVEY.md §2.1).
"""

from typing import Optional

from flax import nnx

from sihl_tpu.backbones.base import PyramidBackbone
from sihl_tpu.backbones.resnet import RESNET_CONFIGS, make_resnet_features

_FEATURE_FACTORIES = {}
for _name in RESNET_CONFIGS:
    _FEATURE_FACTORIES[_name] = make_resnet_features


def _register_lazy_factories():
    """Import optional feature-net families, skipping ones not yet built."""
    try:
        from sihl_tpu.backbones.efficientnet import (
            EFFICIENTNET_CONFIGS,
            make_efficientnet_features,
        )

        for name in EFFICIENTNET_CONFIGS:
            _FEATURE_FACTORIES[name] = make_efficientnet_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.mobilenet import (
            MOBILENET_CONFIGS,
            make_mobilenet_features,
        )

        for name in MOBILENET_CONFIGS:
            _FEATURE_FACTORIES[name] = make_mobilenet_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.convnext import (
            CONVNEXT_CONFIGS,
            make_convnext_features,
        )

        for name in CONVNEXT_CONFIGS:
            _FEATURE_FACTORIES[name] = make_convnext_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.densenet import DENSENET_CONFIGS, make_densenet_features

        for name in DENSENET_CONFIGS:
            _FEATURE_FACTORIES[name] = make_densenet_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.shufflenet import (
            SHUFFLENET_CONFIGS,
            make_shufflenet_features,
        )

        for name in SHUFFLENET_CONFIGS:
            _FEATURE_FACTORIES[name] = make_shufflenet_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.mnasnet import MNASNET_CONFIGS, make_mnasnet_features

        for name in MNASNET_CONFIGS:
            _FEATURE_FACTORIES[name] = make_mnasnet_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.dla import DLA_CONFIGS, make_dla_features

        for name in DLA_CONFIGS:
            _FEATURE_FACTORIES[name] = make_dla_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.hrnet import HRNET_CONFIGS, make_hrnet_features

        for name in HRNET_CONFIGS:
            _FEATURE_FACTORIES[name] = make_hrnet_features
    except ImportError:
        pass
    try:
        from sihl_tpu.backbones.mobilenetv4 import (
            MOBILENETV4_CONFIGS,
            make_mobilenetv4_features,
        )

        for name in MOBILENETV4_CONFIGS:
            _FEATURE_FACTORIES[name] = make_mobilenetv4_features
    except ImportError:
        pass


_register_lazy_factories()


def backbone_names():
    return tuple(sorted(_FEATURE_FACTORIES))


def Backbone(
    name: str,
    pretrained: bool = False,
    input_channels: int = 3,
    top_level: int = 5,
    frozen_levels: int = 0,
    freeze_batchnorms: bool = False,
    *,
    rngs: Optional[nnx.Rngs] = None,
) -> PyramidBackbone:
    """Build a pyramid backbone by architecture name."""
    if name not in _FEATURE_FACTORIES:
        raise ValueError(
            f"Architecture {name} is not supported. Select from {backbone_names()}"
        )
    rngs = rngs if rngs is not None else nnx.Rngs(0)
    features = _FEATURE_FACTORIES[name](name, input_channels=input_channels, rngs=rngs)
    if pretrained:
        from sihl_tpu.backbones.torchvision_import import load_torchvision_weights

        load_torchvision_weights(features, name, input_channels)
    return PyramidBackbone(
        name,
        features,
        input_channels=input_channels,
        top_level=top_level,
        frozen_levels=frozen_levels,
        pretrained=pretrained,
        freeze_batchnorms=freeze_batchnorms,
        rngs=rngs,
    )


TorchvisionBackbone = Backbone

# timm architecture aliases that map onto native feature nets
_TIMM_ALIASES = {
    "resnet18": "resnet18",
    "resnet34": "resnet34",
    "resnet50": "resnet50",
    "resnet101": "resnet101",
    "resnet152": "resnet152",
    "resnext50_32x4d": "resnext50_32x4d",
    "resnext101_32x8d": "resnext101_32x8d",
    "resnext101_64x4d": "resnext101_64x4d",
    "wide_resnet50_2": "wide_resnet50_2",
    "wide_resnet101_2": "wide_resnet101_2",
    "efficientnet_b0": "efficientnet_b0",
    "efficientnet_b1": "efficientnet_b1",
    "efficientnet_b2": "efficientnet_b2",
    "efficientnet_b3": "efficientnet_b3",
    "efficientnet_b4": "efficientnet_b4",
    "efficientnet_b5": "efficientnet_b5",
    "mobilenetv2_100": "mobilenet_v2",
    "mobilenetv2_050": "mobilenet_v2_050",
    "mobilenetv2_140": "mobilenet_v2_140",
    "mobilenetv3_large_100": "mobilenet_v3_large",
    "mobilenetv3_small_100": "mobilenet_v3_small",
    "mobilenetv3_small_050": "mobilenet_v3_small_050",
    "mobilenetv3_small_075": "mobilenet_v3_small_075",
    "convnext_tiny": "convnext_tiny",
    "convnext_small": "convnext_small",
    "convnext_base": "convnext_base",
    "convnext_large": "convnext_large",
    "densenet121": "densenet121",
    "densenet161": "densenet161",
    "densenet169": "densenet169",
    "mnasnet_100": "mnasnet1_0",
    "mnasnet_050": "mnasnet0_5",
    "efficientnetv2_s": "efficientnet_v2_s",
    "efficientnetv2_m": "efficientnet_v2_m",
    "efficientnetv2_l": "efficientnet_v2_l",
    "resnet26": "resnet26",
    "resnetv2_50": "resnetv2_50",
    "resnetv2_101": "resnetv2_101",
    "efficientnet_lite0": "efficientnet_lite0",
    "convnext_atto": "convnext_atto",
    "convnext_femto": "convnext_femto",
    "convnext_pico": "convnext_pico",
    "convnext_nano": "convnext_nano",
    "convnext_xlarge": "convnext_xlarge",
    "convnext_xxlarge": "convnext_xxlarge",
    "convnextv2_atto": "convnextv2_atto",
    "convnextv2_femto": "convnextv2_femto",
    "convnextv2_pico": "convnextv2_pico",
    "convnextv2_nano": "convnextv2_nano",
    "convnextv2_tiny": "convnextv2_tiny",
    "convnextv2_base": "convnextv2_base",
    "convnextv2_large": "convnextv2_large",
    "dla34": "dla34",
    "dla60": "dla60",
    "dla102": "dla102",
    "dla169": "dla169",
    "hrnet_w18": "hrnet_w18",
    "hrnet_w30": "hrnet_w30",
    "hrnet_w32": "hrnet_w32",
    "hrnet_w40": "hrnet_w40",
    "hrnet_w44": "hrnet_w44",
    "hrnet_w48": "hrnet_w48",
    "hrnet_w64": "hrnet_w64",
    "mobilenetv4_conv_small": "mobilenetv4_conv_small",
    "mobilenetv4_conv_medium": "mobilenetv4_conv_medium",
    "mobilenetv4_conv_large": "mobilenetv4_conv_large",
    "mobilenetv4_hybrid_medium": "mobilenetv4_hybrid_medium",
    "mobilenetv4_hybrid_large": "mobilenetv4_hybrid_large",
}


def TimmBackbone(
    name: str,
    pretrained: bool = False,
    input_channels: int = 3,
    top_level: int = 5,
    frozen_levels: int = 0,
    freeze_batchnorms: bool = False,
    *,
    rngs: Optional[nnx.Rngs] = None,
) -> PyramidBackbone:
    """timm-style naming front-end over the native registry."""
    if name not in _TIMM_ALIASES:
        raise ValueError(
            f"Architecture {name} is not supported. Select from {tuple(sorted(_TIMM_ALIASES))}"
        )
    return Backbone(
        _TIMM_ALIASES[name],
        pretrained=pretrained,
        input_channels=input_channels,
        top_level=top_level,
        frozen_levels=frozen_levels,
        freeze_batchnorms=freeze_batchnorms,
        rngs=rngs,
    )


__all__ = [
    "Backbone",
    "TorchvisionBackbone",
    "TimmBackbone",
    "PyramidBackbone",
    "backbone_names",
]
