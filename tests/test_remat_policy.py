"""SIHL_TPU_REMAT_POLICY=conv: save-only-conv-outputs rematerialization.

The policy must be numerically transparent — it changes only WHEN the
BN/ReLU chain values are (re)computed in the backward, not their values.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import sihl_tpu
from sihl_tpu import Backbone, SihlModel
from sihl_tpu.heads import MulticlassClassification
from sihl_tpu.layers import FPN
from sihl_tpu.training import Trainer
from sihl_tpu.ops import conv1x1 as conv1x1_mod
from sihl_tpu.training import trainer as trainer_mod


def _one_step_loss():
    sihl_tpu.set_compute_dtype(jnp.float32)
    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 32, bottom_level=3, top_level=5, rngs=rngs)
    head = MulticlassClassification(neck.out_channels, num_classes=7, rngs=rngs)
    model = SihlModel(backbone, neck, [head])
    trainer = Trainer(model, optimizer_kwargs={"lr": 1e-2})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    y = jnp.asarray(np.array([1, 2]))
    l0 = float(trainer.training_step(x, y)["trainer/loss"])
    l1 = float(trainer.training_step(x, y)["trainer/loss"])
    return l0, l1


def test_conv_policy_matches_default():
    import jax

    base = _one_step_loss()
    old_policy = trainer_mod._REMAT_POLICY
    old_tag = conv1x1_mod._TAG_CONV_OUT
    try:
        trainer_mod._REMAT_POLICY = "conv"
        conv1x1_mod._TAG_CONV_OUT = True
        # the flags are read at TRACE time; without clearing the jit
        # cache the second leg would re-run the stock executable (the
        # graphdef/avals are identical) and never trace the policy
        jax.clear_caches()
        remat = _one_step_loss()
    finally:
        trainer_mod._REMAT_POLICY = old_policy
        conv1x1_mod._TAG_CONV_OUT = old_tag
        jax.clear_caches()
    # step 0 is identical math; step 1 exercises grads applied through the
    # policy'd backward — both must match the stock path to float precision
    np.testing.assert_allclose(base[0], remat[0], rtol=1e-6)
    np.testing.assert_allclose(base[1], remat[1], rtol=1e-5)
