"""Pyramid backbone wrapper (reference ``src/sihl/torchvision_backbone.py``).

Contract (reference :163-186): output is ``[input] + [level1..top_level]``
where ``outputs[l]`` has spatial size exactly ``(H/2^l, W/2^l)``;
``out_channels[0] == input_channels``; levels above 5 are synthesized with
:class:`AntialiasedDownscaler`; ImageNet normalization is applied inside the
backbone only when ``pretrained and input_channels == 3``; input H/W must be
divisible by ``2**top_level``.

A feature net plugged into this wrapper must expose:

* ``feature_channels: List[int]`` — channels of levels 1..5 (or fewer),
* ``level_modules: List[List[str]]`` — attribute names per level (for
  freezing),
* ``__call__(x) -> List[jnp.ndarray]`` — levels 1..n feature maps, NHWC.
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.preprocessing import Normalize
from sihl_tpu.layers.scalers import AntialiasedDownscaler
from sihl_tpu.ops.image import interpolate

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]


class PyramidBackbone(nnx.Module):
    """Wraps a feature net into the sihl pyramid contract."""

    def __init__(
        self,
        name: str,
        features: nnx.Module,
        input_channels: int = 3,
        top_level: int = 5,
        frozen_levels: int = 0,
        pretrained: bool = False,
        freeze_batchnorms: bool = False,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert top_level >= 1
        self.name = name
        self.input_channels = input_channels
        self.top_level = top_level
        self.features = features
        self.normalize = (
            Normalize(IMAGENET_MEAN, IMAGENET_STD)
            if (pretrained and input_channels == 3)
            else None
        )

        native_levels = min(top_level, len(features.feature_channels))
        self.native_levels = native_levels
        channels = [input_channels] + list(features.feature_channels[:native_levels])
        top_c = channels[-1]
        self.downscalers = nnx.List(
            AntialiasedDownscaler(top_c, top_c, rngs=rngs)
            for _ in range(top_level - native_levels)
        )
        self.out_channels = channels + [top_c] * (top_level - native_levels)

        self.freeze_batchnorms = freeze_batchnorms
        self.set_frozen_levels(frozen_levels if pretrained else 0)
        if self.frozen_levels != 0 and freeze_batchnorms:
            self._set_frozen_bn_eval()

    def set_frozen_levels(self, frozen_levels: int) -> None:
        """Set the frozen prefix and the matching backward-skip boundary.

        Feature nets that honor ``_sg_levels`` cut the gradient chain at the
        deepest frozen level's output, so the frozen prefix (which carries no
        trainable params) skips its backward pass entirely.
        """
        self.frozen_levels = frozen_levels
        n = len(self.features.feature_channels)
        self.features._sg_levels = n if frozen_levels < 0 else min(
            max(frozen_levels, 0), n
        )

    # -- freezing ---------------------------------------------------------
    def frozen_attr_names(self) -> List:
        """Feature-net module paths whose params must not be updated.

        Entries are attribute names (``"stem"``) or ``(attr, index)`` pairs
        addressing one element of a module list (``("stages", 2)``).
        """
        mods = self.features.level_modules
        if self.frozen_levels < 0:
            frozen = [name for level in mods for name in level]
        else:
            k = min(self.frozen_levels, len(mods))
            frozen = [name for level in mods[:k] for name in level]
        return frozen

    def is_frozen_param(self, feature_path) -> bool:
        """Whether a param path (relative to ``features``) is frozen."""
        if len(feature_path) == 0:
            return False
        head = str(feature_path[0])
        pair = (
            (head, int(feature_path[1]))
            if len(feature_path) > 1 and str(feature_path[1]).isdigit()
            else None
        )
        for entry in self.frozen_attr_names():
            if isinstance(entry, tuple):
                if pair is not None and (str(entry[0]), int(entry[1])) == pair:
                    return True
            elif head == str(entry):
                return True
        return False

    def _frozen_modules(self):
        for entry in self.frozen_attr_names():
            if isinstance(entry, tuple):
                yield getattr(self.features, entry[0])[entry[1]]
            else:
                yield getattr(self.features, entry)

    def _set_frozen_bn_eval(self) -> None:
        for module in self._frozen_modules():
            for _, sub in nnx.iter_graph(module):
                if isinstance(sub, nnx.BatchNorm):
                    sub.use_running_average = True

    @property
    def dummy_input(self):
        """Minimal valid input (reference ``torchvision_backbone.py:162``)."""
        import jax.numpy as jnp

        min_size = 2 ** (self.top_level + 1)
        return jnp.zeros((1, min_size, min_size, self.input_channels))

    # -- forward ----------------------------------------------------------
    def __call__(self, input: jnp.ndarray) -> List[jnp.ndarray]:
        b, h, w, _ = input.shape
        assert h % 2**self.top_level == 0 and w % 2**self.top_level == 0, (
            f"input spatial dims {(h, w)} must be divisible by 2^{self.top_level}"
        )
        x = self.normalize(input) if self.normalize is not None else input
        feats = self.features(x)[: self.native_levels]
        outputs = [input] + [
            interpolate(f, size=(h // 2**level, w // 2**level))
            for f, level in zip(feats, range(1, self.native_levels + 1))
        ]
        for downscaler in self.downscalers:
            outputs.append(downscaler(outputs[-1]))
        return outputs
