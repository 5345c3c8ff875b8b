"""Probe which XLA debug options the axon PJRT plugin's XLA accepts.

``XLA_FLAGS`` with an unknown flag is FATAL on this plugin (STATUS.md),
but per-compile ``compiler_options`` raise a catchable error — so this
probes candidates safely, then the accepted ones can be A/B-benched via
``SIHL_TPU_COMPILER_OPTIONS`` (see sihl_tpu/utils/compile_opts.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_xla_flags.py
"""

import jax
import jax.numpy as jnp

CANDIDATES = [
    ("xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("xla_latency_hiding_scheduler_rerun", "2"),
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "1.0"),
    ("xla_tpu_memory_space_assignment_max_repacks", "4"),
    ("xla_tpu_enable_aggressive_loop_fusion", "true"),
    ("xla_tpu_licm_size_inflation_ratio", "1.0"),
    ("xla_tpu_prefer_latch_optimized_rhs_layouts", "true"),
    ("xla_tpu_enable_dot_strength_reduction", "true"),
    ("xla_tpu_rwb_fusion", "true"),
    ("xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "true"),
    ("xla_tpu_enable_async_collective_fusion", "true"),
    ("xla_tpu_scoped_vmem_limit_kib", "65536"),
    ("xla_tpu_vector_load_fusion_window", "2048"),
    ("xla_tpu_vector_store_fusion_window", "1024"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_enable_multi_level_nested_loop_fusion", "true"),
    ("xla_tpu_nd_short_transfer_max_chunks", "4096"),
    ("xla_tpu_copy_elision_analysis_allowance", "300000"),
    ("xla_tpu_copy_insertion_use_region_analysis_limit", "30000"),
    ("xla_tpu_order_dot_after_layout", "true"),
    ("xla_jf_rematerialization_percent_shared_memory_limit", "100"),
    ("xla_tpu_perform_spmd_cse_prevention", "false"),
]


def main():
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128), jnp.bfloat16)
    lowered = jax.jit(f).lower(x)
    ok = []
    for name, val in CANDIDATES:
        try:
            lowered.compile(compiler_options={name: val})
            print(f"ACCEPTED {name}={val}", flush=True)
            ok.append(name)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120]
            print(f"rejected {name}: {msg}", flush=True)
    print("\naccepted:", ",".join(ok))


if __name__ == "__main__":
    main()
