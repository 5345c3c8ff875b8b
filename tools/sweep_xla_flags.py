"""A/B sweep of per-compile XLA knobs (and env levers) on the flagship bench.

Motivated by the round-3 trace drill: 3.85 ms/step (5.4%) is ``copy-done``
stall time — 1688 late HBM->VMEM prefetches of small f32 params per step —
so the memory-space-assignment / scheduler knobs are the prime candidates.

Runs ``bench.py`` once per candidate (serially — the tunnel supports ONE
TPU client at a time), recording one JSON line per run to stdout and
``/tmp/xla_sweep.jsonl``.  Tunnel noise is ~±1%, so only candidates
beating the interleaved baselines by >1.5% deserve a re-run.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_xla_flags.py
  (optionally: a subset of candidate names as argv)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, SIHL_TPU_COMPILER_OPTIONS value, extra env)
CANDIDATES = [
    ("baseline", "", {}),
    # -- prefetch/MSA knobs (copy-done stall evidence) --
    ("async_copy_bw_0.5", "xla_tpu_async_copy_bandwidth_scaling_factor=0.5", {}),
    ("async_copy_bw_0.1", "xla_tpu_async_copy_bandwidth_scaling_factor=0.1", {}),
    (
        "repeated_prefetch_time",
        "xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true",
        {},
    ),
    ("msa_repacks_8", "xla_tpu_memory_space_assignment_max_repacks=8", {}),
    (
        "lhs_rerun2",
        "xla_tpu_enable_latency_hiding_scheduler=true,xla_latency_hiding_scheduler_rerun=2",
        {},
    ),
    # -- fusion/layout knobs --
    ("aggressive_loop_fusion", "xla_tpu_enable_aggressive_loop_fusion=true", {}),
    ("nested_loop_fusion", "xla_tpu_enable_multi_level_nested_loop_fusion=true", {}),
    ("rwb_fusion_off", "xla_tpu_rwb_fusion=false", {}),
    ("order_dot_after_layout", "xla_tpu_order_dot_after_layout=true", {}),
    ("latch_rhs_layouts", "xla_tpu_prefer_latch_optimized_rhs_layouts=true", {}),
    (
        "vector_fusion_windows",
        "xla_tpu_vector_load_fusion_window=4096,xla_tpu_vector_store_fusion_window=2048",
    {}),
    ("scoped_vmem_24m", "xla_tpu_scoped_vmem_limit_kib=24576", {}),
    ("baseline2", "", {}),
    # -- structural env levers --
    ("stem_s2d", "", {"SIHL_TPU_STEM_S2D": "1"}),
    ("bn_split_160", "", {"SIHL_TPU_BN_SPLIT": "160"}),
    ("bn_split_80", "", {"SIHL_TPU_BN_SPLIT": "80"}),
    # per-kernel VMEM budget for the fused-MLP custom calls: buy wider bwd
    # tiles without raising the global scoped-vmem (which regressed convs)
    (
        "mlp_vmem64_tile2048",
        "",
        {"SIHL_TPU_MLP_VMEM_MB": "64", "SIHL_TPU_MLP_BWD_TILE": "2048"},
    ),
    (
        "mlp_vmem96_tile4096",
        "",
        {"SIHL_TPU_MLP_VMEM_MB": "96", "SIHL_TPU_MLP_BWD_TILE": "4096",
         "SIHL_TPU_MLP_FWD_TILE": "4960"},
    ),
]


def run_bench(opts: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    if opts:
        env["SIHL_TPU_COMPILER_OPTIONS"] = opts
    else:
        env.pop("SIHL_TPU_COMPILER_OPTIONS", None)
    env.update(extra_env)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=REPO,
    )
    wall = time.time() - t0
    line = ""
    for ln in p.stdout.splitlines():
        if ln.startswith("{"):
            line = ln
    if not line:
        return {"error": (p.stderr or p.stdout).splitlines()[-3:], "wall_s": wall}
    out = json.loads(line)
    out["wall_s"] = round(wall, 1)
    return out


def main():
    only = set(sys.argv[1:])
    results = []
    with open("/tmp/xla_sweep.jsonl", "a") as f:
        for name, opts, extra_env in CANDIDATES:
            if only and name not in only:
                continue
            res = run_bench(opts, extra_env)
            res["candidate"] = name
            res["opts"] = opts
            if extra_env:
                res["env"] = extra_env
            results.append(res)
            print(json.dumps(res), flush=True)
            f.write(json.dumps(res) + "\n")
            f.flush()
    oks = [r for r in results if "value" in r]
    if oks:
        best = max(oks, key=lambda r: r["value"])
        print(f"\nbest: {best['candidate']} {best['value']} img/s")


if __name__ == "__main__":
    main()
