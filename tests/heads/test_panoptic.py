import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import PanopticSegmentation
from sihl_tpu.heads.panoptic_segmentation import panoptic_targets_from_maps

from conftest import make_pyramid

BATCH = 2
H = W = 64
STUFF, THINGS = 3, 4
T = 5


def make():
    pyramid = [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH, height=H, width=W)]
    head = PanopticSegmentation(
        [x.shape[-1] for x in pyramid], STUFF, THINGS, num_channels=16,
        num_layers=2, max_instances=8, max_targets=T,
        soft_label_decay_steps=100, ignore_index=-1, rngs=nnx.Rngs(0),
    )
    rng = np.random.RandomState(0)
    semantic = rng.randint(0, STUFF + THINGS, (BATCH, H, W))
    classes = np.full((BATCH, T), -1, np.int32)
    masks = np.zeros((BATCH, T, 32, 32), np.float32)
    for t in range(2):
        classes[1, t] = rng.randint(0, THINGS)
        y, x = rng.randint(0, 24, 2)
        masks[1, t, y : y + 8, x : x + 8] = 1.0
    return head, pyramid, jnp.asarray(semantic), jnp.asarray(classes), jnp.asarray(masks)


def test_forward():
    head, inputs, *_ = make()
    head.eval()
    class_map, id_map, num, scores, classes = head(inputs)
    assert class_map.shape == (BATCH, H // 8, W // 8)
    assert id_map.shape == (BATCH, H // 8, W // 8)
    cm = np.asarray(class_map)
    assert cm.min() >= 0 and cm.max() < STUFF + THINGS


def test_training_step():
    head, inputs, semantic, classes, masks = make()
    head.train()
    loss, metrics = head.training_step(inputs, semantic, classes, masks)
    assert np.isfinite(float(loss))
    assert "semantic_loss" in metrics and "mask_loss" in metrics
    assert int(head.step_counter[...]) == 1
    # label smoothing decays with step counter
    s0 = float(head._label_smoothing())
    head.step_counter[...] = jnp.asarray(50, jnp.int32)
    assert float(head._label_smoothing()) < s0


def test_validation():
    head, inputs, semantic, classes, masks = make()
    head.eval()
    state = head.metrics_init()
    state, loss, aux = head.validation_step(state, inputs, semantic, classes, masks)
    metrics = head.validation_end(state, [jax.device_get(aux)])
    assert "pq" in metrics and "semantic_mean_iou" in metrics
    assert 0 <= metrics["pq"] <= 1


def test_targets_from_maps():
    semantic = np.full((16, 16), 0, np.int64)  # stuff class 0
    id_map = np.zeros((16, 16), np.int64)
    semantic[2:6, 2:6] = STUFF + 1  # a thing
    id_map[2:6, 2:6] = 42
    semantic[10:14, 10:14] = STUFF  # another thing
    id_map[10:14, 10:14] = 99
    classes, masks = panoptic_targets_from_maps(semantic, id_map, STUFF, T)
    got = {int(c) for c in classes if c >= 0}
    assert got == {0, 1}
    assert masks.sum() == 32


def test_pq_perfect():
    from sihl_tpu.utils.panoptic_quality import PanopticQuality

    pq = PanopticQuality(num_stuff_classes=STUFF)
    cm = np.random.RandomState(0).randint(0, STUFF + THINGS, (16, 16))
    ids = np.random.RandomState(1).randint(0, 3, (16, 16))
    pq.update(cm, ids, cm, ids)
    out = pq.compute()
    assert np.isclose(out["pq"], 1.0)
