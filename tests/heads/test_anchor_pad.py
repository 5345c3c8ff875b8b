"""Anchor-axis padding parity: flatten_laterals pads the flattened anchor
dim to a lane/tile-friendly multiple (SIHL_TPU_ANCHOR_PAD) so the
(B, A, C) <-> (B*A, C) reshapes around the fused-MLP kernel are free
bitcasts.  Padded rows are zero, sliced off every dense output, and carry
zero cotangent — so losses and outputs are bit-identical to the unpadded
program, and parameter gradients match to reduction-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import sihl_tpu.heads.anchors as anchor_lib
from sihl_tpu.heads import (
    InstanceSegmentation,
    KeypointDetection,
    ObjectDetection,
    QuadrilateralDetection,
)


def _pyramid(batch=2, size=48, channels=(3, 16, 24, 32, 40, 48)):
    rng = np.random.RandomState(0)
    feats = []
    for lvl, c in enumerate(channels):
        s = size // (2**lvl) if lvl else size
        feats.append(jnp.asarray(rng.rand(batch, s, s, c), jnp.float32))
    return feats


def _det_targets(batch=2, t=5, size=48, num_classes=7):
    rng = np.random.RandomState(1)
    classes = np.full((batch, t), -1, np.int32)
    boxes = np.zeros((batch, t, 4), np.float32)
    for b in range(batch):
        n = rng.randint(1, t)
        classes[b, :n] = rng.randint(0, num_classes, n)
        xy = rng.rand(n, 2) * (size - 10)
        wh = rng.rand(n, 2) * 8 + 2
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
    return jnp.asarray(classes), jnp.asarray(boxes)


def _with_pad(monkeypatch, value):
    monkeypatch.setattr(anchor_lib, "_ANCHOR_PAD", value)


def test_padded_anchor_count_is_padded(monkeypatch):
    _with_pad(monkeypatch, 256)
    feats = _pyramid()
    head = ObjectDetection([f.shape[-1] for f in feats], 7, bottom_level=2,
                           top_level=4, num_channels=32, num_layers=1,
                           max_targets=5, rngs=nnx.Rngs(0))
    flat = head.flat_features(feats)
    a_true = anchor_lib.num_anchors(feats, head.levels)
    assert flat.shape[1] % 256 == 0 and flat.shape[1] >= a_true
    # the pad block is exactly zero
    assert float(jnp.abs(flat[:, a_true:]).max()) == 0.0


@pytest.mark.parametrize("cls", [ObjectDetection, InstanceSegmentation,
                                 KeypointDetection, QuadrilateralDetection])
def test_dense_loss_and_grads_match_unpadded(monkeypatch, cls):
    feats = _pyramid()
    classes, boxes = _det_targets()
    kw = dict(bottom_level=2, top_level=4, num_channels=32, num_layers=1,
              rngs=nnx.Rngs(0))
    in_ch = [f.shape[-1] for f in feats]
    if cls is ObjectDetection:
        head = cls(in_ch, 7, max_targets=5, **kw)
        targets = dict(classes=classes, boxes=boxes)
    elif cls is InstanceSegmentation:
        masks = jnp.asarray(
            np.random.RandomState(2).rand(2, 5, 48, 48) > 0.6, jnp.float32
        )
        head = cls(in_ch, 7, mask_level=2, **kw)
        targets = dict(classes=classes, masks=masks)
    elif cls is KeypointDetection:
        rng = np.random.RandomState(3)
        kpts = jnp.asarray(rng.rand(2, 5, 4, 2) * 40, jnp.float32)
        presence = jnp.asarray(rng.rand(2, 5, 4) > 0.3, jnp.float32)
        head = cls(in_ch, num_keypoints=4, mask_level=2, **kw)
        targets = dict(keypoints=kpts, presence=presence)
    else:
        rng = np.random.RandomState(4)
        base = rng.rand(2, 5, 1, 2) * 30 + 4
        quads = base + rng.rand(2, 5, 4, 2) * 8
        head = cls(in_ch, 7, max_targets=5, **kw)
        targets = dict(classes=classes, quads=jnp.asarray(quads, jnp.float32))

    graphdef, state = nnx.split(head)

    def loss_fn(state):
        h = nnx.merge(graphdef, state)
        loss, metrics = h.training_step(feats, **targets)
        return loss, metrics

    results = {}
    for pad in (0, 256):
        _with_pad(monkeypatch, pad)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state)
        results[pad] = (loss, metrics, grads)

    l0, m0, g0 = results[0]
    l1, m1, g1 = results[256]
    assert float(l0) == float(l1), (float(l0), float(l1))
    for k in m0:
        assert float(m0[k]) == float(m1[k]), k
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        # param grads contract over the (padded) row dim; the extra zero
        # rows contribute exactly zero but change XLA's reduction-tree
        # grouping of the real summands, so the match is last-ULP-tight
        # rather than bitwise
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6,
        )


def test_inference_matches_unpadded(monkeypatch):
    feats = _pyramid()
    head = ObjectDetection([f.shape[-1] for f in feats], 7, bottom_level=2,
                           top_level=4, num_channels=32, num_layers=1,
                           max_targets=5, rngs=nnx.Rngs(0))
    outs = {}
    for pad in (0, 256):
        _with_pad(monkeypatch, pad)
        outs[pad] = head(feats)
    for a, b in zip(outs[0], outs[256]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
