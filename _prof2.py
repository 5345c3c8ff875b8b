import time, sys
import numpy as np
import jax, jax.numpy as jnp
from flax import nnx
import sihl_tpu
from sihl_tpu import Backbone, SihlModel
from sihl_tpu.heads import ObjectDetection
from sihl_tpu.layers import FPN
from sihl_tpu.training import Trainer

def log(*a):
    print(*a, flush=True)

sihl_tpu.set_compute_dtype(jnp.bfloat16)
B, S = 16, 640
rngs = nnx.Rngs(0)
backbone = Backbone("resnet50", top_level=5, rngs=rngs)
neck = FPN(backbone.out_channels, 256, bottom_level=3, top_level=7, rngs=rngs)
head = ObjectDetection(neck.out_channels, 80, bottom_level=3, top_level=7, max_targets=100, rngs=rngs)
model = SihlModel(backbone, neck, [head])
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, S, S, 3), jnp.float32)
classes = np.full((B, 100), -1, np.int32); classes[:, :10] = rng.randint(0, 80, (B, 10))
boxes = np.zeros((B, 100, 4), np.float32); boxes[:, :10] = rng.rand(B, 10, 4) * 300
boxes[:, :10, 2:] += boxes[:, :10, :2]
tgt = {"classes": jnp.asarray(classes), "boxes": jnp.asarray(boxes)}
log("built")

model.eval()
graphdef, state = nnx.split(model)
fwd = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x)[0][1])  # scores
r = fwd(state, x); _ = np.asarray(r).sum()
log("fwd compiled")
t0 = time.perf_counter()
outs = [fwd(state, x) for _ in range(10)]
_ = sum(np.asarray(o).sum() for o in outs)
t_fwd = (time.perf_counter() - t0) / 10
log(f"inference fwd: {t_fwd*1000:.1f} ms -> {B/t_fwd:.1f} img/s")

model.train()
trainer = Trainer(model, optimizer="adamw",
                  optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4, "backbone_lr_factor": 0.1},
                  grad_clip=0.1)
m = trainer.training_step(x, tgt)
_ = float(m["trainer/loss"])
log("train compiled")
t0 = time.perf_counter()
N = 10
for _ in range(N):
    m = trainer.training_step(x, tgt)
_ = float(m["trainer/loss"])
t_step = (time.perf_counter() - t0) / N
log(f"train step: {t_step*1000:.1f} ms -> {B/t_step:.1f} img/s")
