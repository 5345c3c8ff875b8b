"""Generate per-arch torchvision key+shape manifests from the import walkers.

For every torchvision arch in the reference registry
(``src/sihl/torchvision_backbone.py:13-56``) this constructs the native
feature net, runs the declarative walker through
:func:`sihl_tpu.backbones.torchvision_import.dump_state_dict`, and writes
``tests/fixtures/tv_manifests/{arch}.json`` mapping every torchvision
state-dict key the importer consumes to its expected (OIHW/torch-layout)
shape.

The committed manifests make the import layout auditable without
torchvision in the environment (none here): a reviewer can diff a manifest
against ``torchvision.models.get_model(name).state_dict()`` shapes
offline, and ``tests/test_weight_import.py`` asserts the walkers still
emit exactly the committed manifest — so a walker regression cannot
silently change the layout the loader expects.

Run:  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu \
          python tools/gen_tv_manifests.py
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

from flax import nnx  # noqa: E402

from sihl_tpu.backbones import _FEATURE_FACTORIES  # noqa: E402
from sihl_tpu.backbones.torchvision_import import _family, dump_state_dict  # noqa: E402

# the reference's full torchvision registry (torchvision_backbone.py:13-56)
TORCHVISION_ARCHS = [
    "convnext_base", "convnext_large", "convnext_small", "convnext_tiny",
    "densenet121", "densenet161", "densenet169",
    "efficientnet_b0", "efficientnet_b1", "efficientnet_b2", "efficientnet_b3",
    "efficientnet_b4", "efficientnet_b5", "efficientnet_b6", "efficientnet_b7",
    "efficientnet_v2_l", "efficientnet_v2_m", "efficientnet_v2_s",
    "mnasnet0_5", "mnasnet0_75", "mnasnet1_0", "mnasnet1_3",
    "mobilenet_v2", "mobilenet_v3_large", "mobilenet_v3_small",
    "resnet101", "resnet152", "resnet18", "resnet34", "resnet50",
    "resnext101_32x8d", "resnext101_64x4d", "resnext50_32x4d",
    "shufflenet_v2_x0_5", "shufflenet_v2_x1_0", "shufflenet_v2_x1_5",
    "shufflenet_v2_x2_0",
    "wide_resnet50_2", "wide_resnet101_2",
]

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "tv_manifests")


def manifest_for(name: str) -> dict:
    features = _FEATURE_FACTORIES[name](name, input_channels=3, rngs=nnx.Rngs(0))
    sd = dump_state_dict(features, name)
    return {k: list(v.shape) for k, v in sd.items()}


def main() -> None:
    force = "--force" in sys.argv
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TORCHVISION_ARCHS:
        t0 = time.time()
        if name not in _FEATURE_FACTORIES:
            print(f"SKIP {name}: not in native registry", file=sys.stderr)
            continue
        if not force and os.path.exists(os.path.join(OUT_DIR, f"{name}.json")):
            continue
        _family(name)  # raises if no walker covers the family
        m = manifest_for(name)
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(m, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"{name}: {len(m)} tensors ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
