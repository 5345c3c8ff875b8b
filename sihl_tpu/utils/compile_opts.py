"""Per-compile XLA option plumbing for the hot jitted programs.

The axon PJRT plugin is FATAL on unknown ``XLA_FLAGS`` env flags, but
per-compile ``compiler_options`` raise catchable errors and accept most
TPU tuning knobs (probed by ``tools/probe_xla_flags.py``).  The trainer's
scanned dispatch (the production step program) applies:

* ``DEFAULT_OPTIONS`` — knobs that measurably beat the XLA defaults on
  the flagship bench (A/B results in STATUS.md).  Empty means the
  defaults won.
* ``SIHL_TPU_COMPILER_OPTIONS="k=v,k=v"`` — env override for A/B runs;
  ``SIHL_TPU_COMPILER_OPTIONS=none`` disables DEFAULT_OPTIONS entirely.
"""

import os
from typing import Dict, Optional

DEFAULT_OPTIONS: Dict[str, str] = {}


def compiler_options() -> Optional[Dict[str, str]]:
    """Options for the hot jits: env override if set, else the defaults."""
    spec = os.environ.get("SIHL_TPU_COMPILER_OPTIONS", "")
    if spec.strip().lower() == "none":
        return None
    if spec:
        return dict(kv.split("=", 1) for kv in spec.split(",") if "=" in kv)
    return dict(DEFAULT_OPTIONS) or None
