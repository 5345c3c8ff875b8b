"""Debug: why does ArcFace classification converge but 1-NN retrieval sit
at chance in the quality check?

Trains the same synthetic tint-identity task at small scale on CPU, then
prints (a) the intra- vs inter-class cosine similarity of the learned
embeddings, (b) 1-NN accuracy with the query-in-index protocol (rank-0
dropped, mirroring the reference QuerySetCallback), and (c) 1-NN accuracy
computed eagerly outside `_eval_step` as a cross-check of the jitted
validation path.

Usage: JAX_PLATFORMS=cpu python tools/debug_metric_learning.py [steps]
"""

import sys

import numpy as np


def main(steps=80):
    import jax.numpy as jnp
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import MetricLearning

    sys.path.insert(0, "/root/repo/tools")
    from quality_checks import _make_val_data, _run_scanned, _trainer

    B, S, I = 16, 64, 8
    rng_t = np.random.RandomState(7)
    tints = rng_t.rand(I, 3).astype(np.float32) * 0.7

    def make_batch(rng):
        y = rng.randint(0, I, B)
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.3 + tints[y][:, None, None, :]
        return x, {"targets": y.astype(np.int32)}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = MetricLearning(backbone.out_channels, I, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    trainer.sync_model()
    trainer.model.eval()

    # -- (a) embedding geometry, eager -----------------------------------
    data = _make_val_data(make_batch, n_batches=4)
    embs, ids = [], []
    for x, t in data:
        feats = trainer.model.extract_features(x)
        embs.append(np.asarray(head(feats)))
        ids.append(np.asarray(t["targets"]))
    E = np.concatenate(embs)  # (N, D), unit norm
    Y = np.concatenate(ids)
    sims = E @ E.T
    same = Y[:, None] == Y[None, :]
    off = ~np.eye(len(Y), dtype=bool)
    print(f"intra-class cos: {sims[same & off].mean():.4f}")
    print(f"inter-class cos: {sims[~same].mean():.4f}")

    # -- (b) eager 1-NN, query-in-index, rank-0 dropped -------------------
    order = np.argsort(-sims, axis=1)
    nn1 = Y[order[:, 1]]  # rank-1 (rank-0 is self)
    print(f"eager 1nn accuracy: {(nn1 == Y).mean():.4f}")

    # -- (c) the real validation path -------------------------------------
    head.reset_validation_index_set()
    for x, t in data:
        feats = trainer.model.extract_features(x)
        head.extend_validation_index_set(feats, t["targets"])
    val = trainer.validate(data)
    for k, v in sorted(val.items()):
        print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
