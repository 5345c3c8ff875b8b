"""Monocular depth estimation head, AdaBins-style (reference
``src/sihl/heads/depth_estimation.py``), built on the PP-LiteSeg decoder
by subclassing :class:`SemanticSegmentation` (the reference does the same,
:15).

TPU restructuring: the per-image Python loop for the bidirectional
chamfer histogram loss (reference :113-121) becomes a masked, vmapped
min-reduction over a fixed (pixels x bins) distance matrix.
"""

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.semantic_segmentation import SemanticSegmentation
from sihl_tpu.layers.convblocks import SequentialConvBlocks, make_conv, _rngs
from sihl_tpu.ops.image import interpolate
from sihl_tpu.training import metrics as M
from sihl_tpu.utils import EPS


class DepthEstimation(SemanticSegmentation):
    """https://arxiv.org/abs/2011.14141 (AdaBins)."""

    def __init__(
        self,
        in_channels: List[int],
        lower_bound: float,
        upper_bound: float,
        bottom_level: int = 3,
        top_level: int = 5,
        num_channels: int = 256,
        num_layers: int = 1,
        num_bins: int = 256,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert lower_bound < upper_bound
        assert num_bins > 1
        rngs = _rngs(rngs)
        super().__init__(
            in_channels=in_channels,
            num_classes=num_bins,
            num_channels=num_channels,
            bottom_level=bottom_level,
            top_level=top_level,
            num_layers=num_layers,
            rngs=rngs,
        )
        self.num_bins = num_bins
        self.lower_bound, self.upper_bound = float(lower_bound), float(upper_bound)
        self.bin_convs = SequentialConvBlocks(
            in_channels[top_level], num_channels, num_layers, rngs=rngs
        )
        self.bin_conv_out = make_conv(num_channels, num_bins, 1, rngs=rngs)
        self.output_shapes = {"depth_maps": ("batch_size", "height", "width")}

    def normalize(self, x):
        return (x - self.lower_bound) / (self.upper_bound - self.lower_bound)

    def denormalize(self, x):
        return x * (self.upper_bound - self.lower_bound) + self.lower_bound

    def get_bin_centers(self, inputs) -> jnp.ndarray:
        x = self.bin_conv_out(self.bin_convs(inputs[self.top_level]))
        widths = nnx.relu(jnp.mean(x, axis=(1, 2)).astype(jnp.float32)) + EPS
        widths = widths / jnp.sum(widths, axis=1, keepdims=True)
        return jnp.cumsum(widths, axis=1) - widths / 2  # (B, num_bins)

    def get_depth_map(self, inputs, bin_centers) -> jnp.ndarray:
        weights = nnx.relu(self.get_logits(inputs).astype(jnp.float32)) + EPS
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)  # (B,h,w,bins)
        depth = jnp.sum(weights * bin_centers[:, None, None, :], axis=-1)
        return jnp.clip(depth, 0.0, 1.0)  # (B, h, w)

    def __call__(self, inputs) -> jnp.ndarray:
        bin_centers = self.get_bin_centers(inputs)
        depth = self.denormalize(self.get_depth_map(inputs, bin_centers))
        b, h, w = depth.shape
        full = inputs[0].shape[1:3]
        return interpolate(depth[..., None], size=full)[..., 0]

    def training_step(self, inputs, targets, masks) -> Tuple[jnp.ndarray, Dict]:
        """targets: (B, H, W) absolute depths; masks: (B, H, W) validity."""
        targets = self.normalize(targets.astype(jnp.float32))
        masks_f = masks.astype(jnp.float32)
        # Valid pixels outside the declared [lower, upper] bounds map
        # outside (0, 1] and the log loss NaNs (latent in the reference
        # too, which assumes datasets respect the bounds) — clamp them to
        # the bounds. Invalid pixels can hold arbitrary values (0 depth)
        # and NaN * 0 would still poison the masked sums; the reference
        # never sees them because it boolean-indexes valid pixels —
        # substitute a safe constant.
        targets = jnp.clip(targets, EPS, 1.0)
        targets = jnp.where(masks_f > 0, targets, 1.0)

        bin_centers = self.get_bin_centers(inputs)
        depth = self.get_depth_map(inputs, bin_centers)  # (B, h, w)
        pred_shape = depth.shape[1:3]
        depth_full = interpolate(depth[..., None], size=targets.shape[1:3])[..., 0]

        # scale-invariant log loss over valid pixels (reference :105-106);
        # torch .var() is the unbiased sample variance.
        g = jnp.log(depth_full + EPS) - jnp.log(targets + EPS)
        n = jnp.maximum(jnp.sum(masks_f), 1.0)
        g_mean = jnp.sum(g * masks_f) / n
        g_var = jnp.sum(((g - g_mean) ** 2) * masks_f) / jnp.maximum(n - 1.0, 1.0)
        pix_loss = jnp.sqrt(g_var + 0.15 * g_mean**2) * 10.0

        # bidirectional chamfer between target-depth histogram and bin
        # centers (reference :113-121), masked + batched.
        small_masks = (
            interpolate(masks_f[..., None], size=pred_shape, mode="nearest")[..., 0] > 0
        )
        small_targets = interpolate(targets[..., None], size=pred_shape)[..., 0]
        b = targets.shape[0]
        t_flat = small_targets.reshape(b, -1)  # (B, K)
        m_flat = small_masks.reshape(b, -1)
        dist = (t_flat[:, :, None] - bin_centers[:, None, :]) ** 2  # (B, K, L)
        big = jnp.float32(1e9)
        fwd = jnp.min(dist, axis=2)  # (B, K): nearest bin per pixel
        fwd = jnp.sum(fwd * m_flat, axis=1) / jnp.maximum(jnp.sum(m_flat, axis=1), 1.0)
        bwd = jnp.min(
            jnp.where(m_flat[:, :, None], dist, big), axis=1
        )  # (B, L): nearest valid pixel per bin
        any_valid = jnp.any(m_flat, axis=1, keepdims=True)
        bwd = jnp.mean(jnp.where(any_valid, bwd, 0.0), axis=1)
        hist_loss = jnp.mean(fwd + bwd)

        loss = pix_loss + hist_loss
        return loss, {"pixel_loss": pix_loss, "hist_loss": hist_loss}

    def metrics_init(self):
        return {"loss": M.mean_init(), "reg": M.regression_init()}

    def validation_step(self, state, inputs, targets, masks):
        loss, _ = self.training_step(inputs, targets, masks)
        depth = self(inputs)
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "reg": M.regression_update(state["reg"], depth, targets, mask=masks),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        reg = M.regression_compute(state["reg"])
        return {
            "loss": float(M.mean_compute(state["loss"])),
            "rmse": float(jnp.sqrt(reg["mean_squared_error"])),
            "mae": float(reg["mean_absolute_error"]),
        }
