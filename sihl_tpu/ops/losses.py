"""Loss functions, always computed in fp32 (the reference wraps every loss
in an fp32 autocast-off island, e.g. ``src/sihl/heads/object_detection.py:158``;
here we upcast explicitly instead).

Parity targets: ``focal_loss`` / ``tversky_loss`` / ``ssim_loss`` at reference
``src/sihl/utils/__init__.py:184-231``, ``sigmoid_focal_loss`` (torchvision)
used by ``src/sihl/heads/quadrilateral_detection.py:205``, log-cosh at
``src/sihl/heads/regression.py:61``.
"""

import jax
import jax.numpy as jnp

from sihl_tpu.ops.image import avg_pool2d

EPS = 1e-5


def _f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def binary_cross_entropy(probs, targets):
    """Elementwise BCE on probabilities (torch ``F.binary_cross_entropy``)."""
    probs, targets = _f32(probs, targets)
    p = jnp.clip(probs, EPS, 1.0 - EPS)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def binary_cross_entropy_with_logits(logits, targets):
    """Numerically-stable elementwise BCE on logits."""
    logits, targets = _f32(logits, targets)
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def cross_entropy(
    logits,
    targets,
    label_smoothing: float = 0.0,
    ignore_index: int | None = None,
    axis: int = -1,
):
    """Elementwise categorical cross-entropy over integer targets.

    Returns per-element losses (no reduction); entries equal to
    ``ignore_index`` yield 0 loss.  Matches torch ``F.cross_entropy`` with
    ``reduction="none"`` and optional label smoothing.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[axis]
    log_probs = jax.nn.log_softmax(logits, axis=axis)
    valid = (
        jnp.ones_like(targets, dtype=bool)
        if ignore_index is None
        else targets != ignore_index
    )
    safe_targets = jnp.where(valid, targets, 0)
    one_hot = jax.nn.one_hot(safe_targets, num_classes, axis=axis, dtype=jnp.float32)
    static_zero = isinstance(label_smoothing, (int, float)) and label_smoothing == 0.0
    if not static_zero:  # works for traced (schedule-driven) smoothing too
        one_hot = one_hot * (1.0 - label_smoothing) + label_smoothing / num_classes
    loss = -jnp.sum(one_hot * log_probs, axis=axis)
    return jnp.where(valid, loss, 0.0)


def focal_loss(probs, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss on *probabilities* (reference ``utils/__init__.py:203-213``)."""
    probs, targets = _f32(probs, targets)
    ce = binary_cross_entropy(probs, targets)
    p_t = probs * targets + (1.0 - probs) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * ce * (1.0 - p_t) ** gamma


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss on logits (torchvision ``ops.sigmoid_focal_loss`` semantics)."""
    logits, targets = _f32(logits, targets)
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def tversky_loss(
    logits, targets, alpha: float = 0.5, beta: float = 0.5, ignore_index: int = -100
):
    """Tversky loss for dense segmentation; logits (B, H, W, C), targets (B, H, W)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = (targets != ignore_index)[..., None].astype(jnp.float32)
    one_hot = jax.nn.one_hot(jnp.where(targets == ignore_index, 0, targets), num_classes)
    one_hot = one_hot * valid
    probs = jax.nn.softmax(logits, axis=-1) * valid
    tp = jnp.sum(probs * one_hot, axis=(1, 2))
    fn = jnp.sum((1.0 - probs) * one_hot, axis=(1, 2))
    fp = jnp.sum(probs * (1.0 - one_hot), axis=(1, 2))
    return 1.0 - jnp.mean((tp + EPS) / (tp + alpha * fp + beta * fn + EPS))


def ssim_loss(pred, gt, window_size: int = 11, size_average: bool = True):
    """Structural-similarity loss on NHWC images (reference ``utils:184-200``)."""
    pred, gt = _f32(pred, gt)
    pad = window_size // 2
    c1, c2 = 0.01**2, 0.03**2

    def pool(x):
        return avg_pool2d(x, window_size, stride=1, padding=pad)

    mu1, mu2 = pool(pred), pool(gt)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = pool(pred * pred) - mu1_sq
    sigma2_sq = pool(gt * gt) - mu2_sq
    sigma12 = pool(pred * gt) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    reduced = jnp.mean(ssim_map) if size_average else jnp.sum(ssim_map)
    return jnp.abs(1.0 - reduced)


def log_cosh_loss(pred, target):
    """Numerically-stable log-cosh regression loss (reference ``regression.py:61``)."""
    pred, target = _f32(pred, target)
    x = pred - target
    # log(cosh(x)) = |x| + log1p(exp(-2|x|)) - log(2)
    return jnp.abs(x) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(x))) - jnp.log(2.0)
