"""StableHLO export round-trip parity (the analog of the reference's
ONNX-parity tests, e.g. ``tests/heads/test_object_detection.py:83-128``:
export, reload, run, compare outputs)."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu import SihlModel, Backbone
from sihl_tpu.export import export_model, load_exported, save_exported
from sihl_tpu.heads import MulticlassClassification, ObjectDetection
from sihl_tpu.layers import FPN


def build_model():
    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 32, bottom_level=3, top_level=5, rngs=rngs)
    heads = [
        MulticlassClassification(neck.out_channels, 4, num_channels=8, rngs=rngs),
        ObjectDetection(neck.out_channels, 3, num_channels=16, num_layers=1,
                        max_instances=8, max_targets=4, rngs=rngs),
    ]
    return SihlModel(backbone, neck, heads)


def test_export_roundtrip_parity(tmp_path):
    model = build_model()
    model.eval()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    expected = model(x)

    exported = export_model(model, (2, 64, 64, 3), batch_polymorphic=False)
    path = str(tmp_path / "model.stablehlo")
    save_exported(exported, path)
    reloaded = load_exported(path)
    outputs = reloaded.call(x)

    import jax

    for a, b in zip(jax.tree_util.tree_leaves(expected), jax.tree_util.tree_leaves(outputs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_export_batch_polymorphic():
    model = build_model()
    model.eval()
    exported = export_model(model, (2, 64, 64, 3), batch_polymorphic=True)
    for b in (1, 3):
        x = jnp.ones((b, 64, 64, 3), jnp.float32)
        outputs = exported.call(x)
        scores = outputs[0][0]
        assert scores.shape[0] == b


def test_export_runs_in_fresh_interpreter(tmp_path):
    """Load the serialized artifact in a clean subprocess that never
    imports sihl_tpu — a genuinely separate runtime, the analog of the
    reference running its ONNX export under onnxruntime
    (``tests/heads/test_object_detection.py:83-107``)."""
    import os
    import subprocess
    import sys

    model = build_model()
    model.eval()
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    expected = model(jnp.asarray(x))

    exported = export_model(model, (2, 64, 64, 3), batch_polymorphic=False)
    save_exported(exported, str(tmp_path / "model.stablehlo"))
    import jax

    np.savez(
        tmp_path / "io.npz",
        x=x,
        **{f"out_{i}": np.asarray(leaf)
           for i, leaf in enumerate(jax.tree_util.tree_leaves(expected))},
    )

    runner = tmp_path / "runner.py"
    runner.write_text(
        """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jax_export

tmp = sys.argv[1]
with open(tmp + "/model.stablehlo", "rb") as f:
    exported = jax_export.deserialize(f.read())
io = np.load(tmp + "/io.npz")
outs = jax.tree_util.tree_leaves(exported.call(io["x"]))
for i, got in enumerate(outs):
    np.testing.assert_allclose(
        np.asarray(got), io[f"out_{i}"], atol=1e-4,
        err_msg=f"output {i} diverged in fresh runtime",
    )
print("FRESH_RUNTIME_PARITY_OK", len(outs))
"""
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # the artifact must not need sihl_tpu
    proc = subprocess.run(
        [sys.executable, str(runner), str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FRESH_RUNTIME_PARITY_OK" in proc.stdout
