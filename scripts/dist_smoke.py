"""Two-process jax.distributed smoke on CPU (the multi-host init path).

Exercises parallel/launch.init_distributed exactly as a real multi-host TPU
launch would (one call per process, coordinator + process_id), then runs a
cross-process psum over the global 2-device mesh — the minimal proof that the
distributed runtime, global device enumeration, and collectives compose.
(The reference has no distributed backend at all — SURVEY.md §2.3.)

Usage:  python scripts/dist_smoke.py            # spawns both workers
        python scripts/dist_smoke.py WORKER N   # internal
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("MQTPU_DIST_PORT", "19741"))


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mobilequant_tpu.parallel.launch import init_distributed

    info = init_distributed(f"localhost:{PORT}", 2, pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2 * info["local_devices"], info

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
    n = info["global_devices"]
    x = jax.device_put(jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4),
                       NamedSharding(mesh, P("dp", None)))
    f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "dp"), mesh=mesh,
                              in_specs=P("dp", None),
                              out_specs=P(None, None)))
    out = np.asarray(jax.device_get(f(x)))
    ref = np.arange(n * 4, dtype=np.float32).reshape(n, 4).sum(0)
    np.testing.assert_allclose(out[0], ref)
    print(f"dist_smoke worker {pid}: ok "
          f"(procs={info['process_count']}, global_devices={n})", flush=True)


def main() -> int:
    procs = [subprocess.Popen([sys.executable, os.path.abspath(__file__),
                               "WORKER", str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=180)
        txt = out.decode(errors="replace")
        if p.returncode != 0 or "ok" not in txt:
            rc = 1
        print(f"--- worker {i} (rc={p.returncode}) ---")
        print("\n".join(ln for ln in txt.splitlines()
                        if "WARNING" not in ln)[-2000:])
    print("dist_smoke:", "PASSED" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "WORKER":
        worker(int(sys.argv[2]))
    else:
        sys.exit(main())
