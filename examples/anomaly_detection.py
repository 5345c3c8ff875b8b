"""Anomaly detection example (reference ``examples/anomaly_detection.py``:
MVTec).  Runs the pretraining (teacher calibration) pass first, like the
reference's manual loop (:124-131)."""

import numpy as np

from common import parse_args, build_trainer, synthetic_images
from flax import nnx
from sihl_tpu import Backbone, SihlModel
from sihl_tpu.heads import AnomalyDetection


def main():
    args = parse_args()
    rngs = nnx.Rngs(0)
    backbone = Backbone(args.backbone, pretrained=args.pretrained,
                        frozen_levels=-1 if args.pretrained else 0,
                        freeze_batchnorms=True, rngs=rngs)
    head = AnomalyDetection(backbone.out_channels, rngs=rngs)
    trainer = build_trainer(SihlModel(backbone, None, [head]), args)

    def data():
        if args.data:
            from common import image_folder_batches

            for x, _ in image_folder_batches(args)[1]:
                yield x, None
            return
        for x in synthetic_images(args):
            yield x, None

    it = data()
    trainer.pretrain([next(it) for _ in range(4)])
    for step in range(args.steps):
        metrics = trainer.training_step(*next(it))
    print({"trainer/loss": float(metrics["trainer/loss"])})

    rng = np.random.RandomState(1)
    x, _ = next(it)
    anomalous = x.copy()
    anomalous[:, 30:60, 30:60] = rng.rand(args.batch_size, 30, 30, 3)
    targets = np.zeros(x.shape[:3], np.float32)
    val = trainer.validate([(x, np.zeros_like(targets)), (anomalous, np.ones_like(targets))])
    print(val)


if __name__ == "__main__":
    main()
