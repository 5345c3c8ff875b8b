"""Multi-host init path (SURVEY.md §5.8): the two-process rehearsal must
actually execute ``initialize_distributed``'s multi-process branch —
both OS processes join one coordination service, see all 8 global
devices, and agree on a cross-process jitted reduction."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_rehearsal():
    env = dict(os.environ)
    path = env.get("PYTHONPATH", "")
    if REPO not in path.split(os.pathsep):
        env["PYTHONPATH"] = REPO + (os.pathsep + path if path else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "distributed_rehearsal.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "REHEARSAL OK" in proc.stdout, proc.stdout
    assert proc.stdout.count("process_count=2") == 2, proc.stdout
