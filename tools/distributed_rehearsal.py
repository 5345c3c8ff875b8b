"""Two-process ``jax.distributed`` rehearsal (SURVEY.md §5.8).

Exercises the real multi-host init path — ``initialize_distributed`` with
a localhost coordinator, two OS processes, 4 virtual CPU devices each —
so ``parallel/__init__.py``'s multi-process branch is *executed*, not just
written.  Each process:

1. joins the coordination service (``jax.distributed.initialize``),
2. asserts ``jax.process_count() == 2`` and sees all 8 global devices,
3. builds the standard ``("data", "model")`` mesh spanning both processes,
4. assembles a global array from process-local shards
   (``jax.make_array_from_process_local_data``) and reduces it with a
   jitted cross-process sum — the same collective path a multi-host DP
   gradient reduction takes.

Run:  python tools/distributed_rehearsal.py
Expected output: two ``rank N ... sum=96.0 OK`` lines and ``REHEARSAL OK``.
"""

import os
import socket
import subprocess
import sys

N_LOCAL = 4  # virtual CPU devices per process
N_PROC = 2


def child(rank: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={N_LOCAL}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sihl_tpu.parallel import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=rank,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == N_PROC * N_LOCAL, n_global

    mesh = make_mesh()  # spans both processes' devices
    # global (8, 8) array assembled from per-process (4, 8) shards
    local = np.full((N_LOCAL, 8), float(rank + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(arr)
    value = float(total)  # 4*8*1 + 4*8*2 = 96
    assert value == 96.0, value
    print(
        f"rank {rank}: process_count={jax.process_count()} "
        f"global_devices={n_global} mesh={dict(mesh.shape)} sum={value} OK",
        flush=True,
    )


def main() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(N_PROC):
        env = dict(os.environ)
        path = env.get("PYTHONPATH", "")
        if repo not in path.split(os.pathsep):
            env["PYTHONPATH"] = repo + (os.pathsep + path if path else "")
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), str(rank), str(port)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    ok = True
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        sys.stdout.write(out)
        if p.returncode != 0 or "OK" not in out:
            ok = False
    print("REHEARSAL OK" if ok else "REHEARSAL FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) == 3:
        child(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(main())
