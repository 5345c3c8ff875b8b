"""End-to-end smoke runs of representative example scripts.

Each example is a user-facing entry point composing backbone + neck +
head + Trainer; unit tests cover the parts, these cover the wiring.
Run as subprocesses on CPU with tiny shapes (the examples' own CLI).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"

# one per head family: classification, detection-family (+ fused MLP
# path), dense, dynamic-kernel, composition
SMOKE = [
    "multiclass_classification.py",
    "object_detection.py",
    "semantic_segmentation.py",
    "keypoint_detection.py",
    "multitask.py",
]

# SIHL_TPU_TEST_ALL_EXAMPLES=1 widens the sweep to every task script
# (~40 min on this 1-core box, so not part of the default suite).
if os.environ.get("SIHL_TPU_TEST_ALL_EXAMPLES", "0") == "1":
    SMOKE = sorted(
        p.name
        for p in EXAMPLES.glob("*.py")
        if p.name not in ("common.py",)
    )


@pytest.mark.parametrize("script", SMOKE)
def test_example_smoke(script):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(EXAMPLES.parent)
    proc = subprocess.run(
        [
            sys.executable, str(EXAMPLES / script),
            "--steps", "2", "--batch-size", "2", "--image-size", "64",
        ],
        capture_output=True, text=True, env=env, cwd=str(EXAMPLES), timeout=560,
    )
    assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-1500:])
    assert "trainer/loss" in proc.stdout
