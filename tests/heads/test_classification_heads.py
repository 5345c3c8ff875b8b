"""Head test quartet (forward / training_step / validation / jit contract),
mirroring the reference pattern (``tests/heads/test_multiclass_classification.py``).
The ONNX-parity test becomes a jit-vs-eager parity test: jit is our export
path."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import (
    MulticlassClassification,
    MultilabelClassification,
    Regression,
)

from conftest import make_pyramid

NUM_CLASSES = 7
BATCH = 2


def pyramid():
    return [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH)]


def check_output_shapes(outputs, head):
    if not isinstance(outputs, tuple):
        outputs = (outputs,)
    for out, (name, shape) in zip(outputs, head.output_shapes.items()):
        expected = tuple(BATCH if isinstance(s, str) else s for s in shape)
        assert out.shape == expected, (name, out.shape, expected)


def check_jit_parity(head, inputs):
    graphdef, state = nnx.split(head)

    @jax.jit
    def run(state, inputs):
        return nnx.merge(graphdef, state)(inputs)

    eager = head(inputs)
    jitted = run(state, inputs)
    for a, b in zip(jax.tree_util.tree_leaves(eager), jax.tree_util.tree_leaves(jitted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestMulticlass:
    def make(self, **kw):
        inputs = pyramid()
        head = MulticlassClassification(
            [x.shape[-1] for x in inputs], NUM_CLASSES, num_channels=16,
            rngs=nnx.Rngs(0), **kw,
        )
        target = jnp.asarray(np.random.RandomState(0).randint(0, NUM_CLASSES, BATCH))
        return head, inputs, target

    def test_forward(self):
        head, inputs, _ = self.make()
        head.eval()
        outputs = head(inputs)
        check_output_shapes(outputs, head)
        check_jit_parity(head, inputs)

    def test_training_step(self):
        head, inputs, target = self.make(label_smoothing=0.1)
        loss, metrics = head.training_step(inputs, target)
        assert np.isfinite(float(loss))

    def test_ordinal(self):
        head, inputs, target = self.make(is_ordinal=True)
        loss, _ = head.training_step(inputs, target)
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs, target = self.make()
        head.eval()
        state = head.metrics_init()
        state, loss, _ = head.validation_step(state, inputs, target)
        state, loss, _ = head.validation_step(state, inputs, target)
        metrics = head.validation_end(state)
        assert set(metrics) == {"loss", "accuracy", "precision", "recall"}
        assert all(np.isfinite(v) for v in metrics.values())


class TestMultilabel:
    def make(self):
        inputs = pyramid()
        head = MultilabelClassification(
            [x.shape[-1] for x in inputs], NUM_CLASSES, num_channels=16, rngs=nnx.Rngs(0)
        )
        target = jnp.asarray(
            (np.random.RandomState(0).rand(BATCH, NUM_CLASSES) > 0.5).astype(np.float32)
        )
        return head, inputs, target

    def test_forward(self):
        head, inputs, _ = self.make()
        head.eval()
        scores, labels = head(inputs)
        check_output_shapes((scores, labels), head)
        assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-6)  # sorted desc
        check_jit_parity(head, inputs)

    def test_training_step(self):
        head, inputs, target = self.make()
        loss, _ = head.training_step(inputs, target)
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs, target = self.make()
        head.eval()
        state = head.metrics_init()
        state, _, _ = head.validation_step(state, inputs, target)
        metrics = head.validation_end(state)
        assert set(metrics) == {"loss", "accuracy", "precision", "recall"}


class TestRegression:
    def make(self):
        inputs = pyramid()
        head = Regression(
            [x.shape[-1] for x in inputs], lower_bound=-3.0, upper_bound=10.0,
            num_channels=16, rngs=nnx.Rngs(0),
        )
        target = jnp.asarray(np.random.RandomState(0).rand(BATCH) * 13.0 - 3.0)
        return head, inputs, target

    def test_forward(self):
        head, inputs, _ = self.make()
        head.eval()
        values = head(inputs)
        check_output_shapes(values, head)
        assert np.all(np.asarray(values) >= -3.0) and np.all(np.asarray(values) <= 10.0)
        check_jit_parity(head, inputs)

    def test_training_step(self):
        head, inputs, target = self.make()
        loss, _ = head.training_step(inputs, target)
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs, target = self.make()
        head.eval()
        state = head.metrics_init()
        state, _, _ = head.validation_step(state, inputs, target)
        metrics = head.validation_end(state)
        assert set(metrics) == {
            "loss", "r_squared", "mean_absolute_error", "mean_squared_error",
        }
