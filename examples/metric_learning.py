"""Metric learning example (reference ``examples/metric_learning.py``:
Stanford Cars retrieval)."""

import numpy as np

from common import parse_args, run, synthetic_images, build_trainer
from sihl_tpu import SihlModel
from sihl_tpu.heads import MetricLearning

NUM_IDENTITIES = 16


def model_fn(backbone, rngs):
    head = MetricLearning(backbone.out_channels, NUM_IDENTITIES, rngs=rngs)
    return SihlModel(backbone, None, [head]), {}


def data_fn(args):
    if args.data:
        from common import image_folder_batches

        ds, loader = image_folder_batches(args)
        global NUM_IDENTITIES
        NUM_IDENTITIES = len(ds.class_names)
        return loader
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        yield x, rng.randint(0, NUM_IDENTITIES, args.batch_size)


if __name__ == "__main__":
    args = parse_args()
    trainer = run(args, model_fn, data_fn)
    # retrieval validation: populate the index set, then validate
    head = trainer.model.heads[0]
    head.reset_validation_index_set()
    x, ids = next(data_fn(args))
    import jax.numpy as jnp
    feats = trainer.model.extract_features(jnp.asarray(x))
    head.extend_validation_index_set(feats, jnp.asarray(ids))
    print(trainer.validate([(x, ids)]))
