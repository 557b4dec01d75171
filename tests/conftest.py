"""Test config: force CPU with 8 virtual devices so sharding tests run without a pod.

Must set env vars before jax is imported anywhere (see SURVEY.md §4: the reference has
no tests; our strategy is unit tests + fidelity-ladder allclose + virtual-mesh
distributed tests).
"""

import os

# Force CPU even if the ambient environment points at a TPU: tests must be
# deterministic and runnable anywhere, and fp32 parity tolerances assume CPU
# (TPU fp32 matmul defaults to bf16-precision MXU passes). Note: a sitecustomize
# on PYTHONPATH may import jax before this file runs, so the env var alone is not
# enough — jax.config.update still works as long as no backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >25s tests (kernel matrices, pipeline-parallel training, full "
        "CLI journeys). Inner loop: pytest -m 'not slow' (~12 min); CI/full: "
        "no filter (~21 min).")
