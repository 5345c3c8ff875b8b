"""Tests for view-invariance (Barlow Twins), metric learning (ArcFace),
and text recognition heads."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import ViewInvarianceLearning, MetricLearning, TextRecognition

from conftest import make_pyramid

BATCH = 4


def pyramid(seed=0):
    return [
        jnp.asarray(x)
        for x in make_pyramid(batch_size=BATCH, rng=np.random.RandomState(seed))
    ]


class TestViewInvariance:
    def make(self):
        inputs = pyramid(0)
        inputs2 = pyramid(1)
        head = ViewInvarianceLearning(
            [x.shape[-1] for x in inputs], embedding_dim=16, num_channels=8,
            num_layers=1, rngs=nnx.Rngs(0),
        )
        return head, inputs, inputs2

    def test_forward(self):
        head, inputs, _ = self.make()
        head.eval()
        repr_ = head(inputs)
        assert repr_.shape == (BATCH, 16)
        assert head.target_is_second_view

    def test_training_step(self):
        head, inputs, inputs2 = self.make()
        head.train()
        loss, _ = head.training_step(inputs, inputs2)
        assert np.isfinite(float(loss))
        # identical views in eval mode should give lower loss than random ones
        head.eval()
        loss_same, _ = head.training_step(inputs, inputs)
        loss_diff, _ = head.training_step(inputs, inputs2)
        assert float(loss_same) < float(loss_diff)

    def test_validation(self):
        head, inputs, inputs2 = self.make()
        head.eval()
        state = head.metrics_init()
        state, _, _ = head.validation_step(state, inputs, inputs2)
        metrics = head.validation_end(state)
        assert set(metrics) == {
            "loss", "normalized_frobenius_norm", "on_diagonal_mean", "off_diagonal_mean",
        }


class TestMetricLearning:
    def make(self, num_subcenters=1):
        inputs = pyramid()
        head = MetricLearning(
            [x.shape[-1] for x in inputs], num_identities=5, embedding_dim=16,
            num_subcenters=num_subcenters, rngs=nnx.Rngs(0),
        )
        targets = jnp.asarray(np.random.RandomState(0).randint(0, 5, BATCH))
        return head, inputs, targets

    def test_forward_unit_norm(self):
        head, inputs, _ = self.make()
        head.eval()
        emb = head(inputs)
        assert emb.shape == (BATCH, 16)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)

    def test_training_step(self):
        for sub in (1, 3):
            head, inputs, targets = self.make(num_subcenters=sub)
            head.train()
            loss, _ = head.training_step(inputs, targets)
            assert np.isfinite(float(loss))

    def test_validation_with_index(self):
        head, inputs, targets = self.make()
        head.eval()
        head.reset_validation_index_set()
        head.extend_validation_index_set(inputs, targets)
        head.extend_validation_index_set(pyramid(1), targets)
        state = head.metrics_init()
        state, _, _ = head.validation_step(state, inputs, targets)
        metrics = head.validation_end(state)
        for k in (1, 3, 5):
            assert f"precision_at_{k}" in metrics
            assert f"{k}nn_accuracy" in metrics
        assert "r_precision" in metrics


class TestTextRecognition:
    def make(self):
        inputs = pyramid()
        head = TextRecognition(
            [x.shape[-1] for x in inputs], num_tokens=10, max_sequence_length=6,
            num_channels=16, embedding_dim=32, rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(0)
        texts = np.full((BATCH, 6), 10, np.int32)  # pad id = num_tokens
        for b in range(BATCH):
            n = rng.randint(1, 6)
            texts[b, :n] = rng.randint(0, 10, n)
        return head, inputs, jnp.asarray(texts)

    def test_forward(self):
        head, inputs, _ = self.make()
        head.eval()
        scores, tokens = head(inputs)
        assert scores.shape == (BATCH, 6)
        assert tokens.shape == (BATCH, 6)
        assert np.asarray(tokens).max() <= 10

    def test_training_step(self):
        head, inputs, texts = self.make()
        head.train()
        loss, _ = head.training_step(inputs, texts)
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs, texts = self.make()
        head.eval()
        state = head.metrics_init()
        collected = []
        state, _, aux = head.validation_step(state, inputs, texts)
        collected.append({k: np.asarray(v) for k, v in aux.items()})
        metrics = head.validation_end(state, collected)
        assert set(metrics) == {"loss", "token_error_rate", "edit_distance", "accuracy"}
        assert 0 <= metrics["accuracy"] <= 1

    def test_text_metrics(self):
        from sihl_tpu.utils.text_metrics import levenshtein, token_error_rate

        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein([1, 2, 3], [1, 2, 3]) == 0
        assert token_error_rate([[1, 2]], [[1, 2]]) == 0.0
        assert token_error_rate([[1, 3]], [[1, 2]]) == 0.5
