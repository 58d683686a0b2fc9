"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-host test strategy in SURVEY.md §4 (f): sharding logic is validated on a
virtual CPU mesh; real-TPU benchmarks run separately via bench.py.
"""

import os

# Force CPU: the ambient environment points JAX at the (single, shared) TPU tunnel
# (JAX_PLATFORMS=axon); unit tests must run on the virtual CPU mesh instead.
# NOTE: sitecustomize imports jax at interpreter start, so setting the env var
# here is NOT enough — jax.config.update("jax_platforms") below is what works.
# SPLAT360_TPU_TESTS=1 opts OUT of the CPU pin so the real-Mosaic parity
# suite (tests/test_pallas_tpu.py) can run against the chip:
#   SPLAT360_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -x -q
# Never combine with another process using the TPU tunnel.
_tpu_tests = os.environ.get("SPLAT360_TPU_TESTS") == "1"
if not _tpu_tests:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _tpu_tests:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU's oneDNN path runs f32 dots in bf16-ish fastmath by default; pin full f32 so
# allclose tests are meaningful. (TPU kernels set their precision explicitly.)
jax.config.update("jax_default_matmul_precision", "highest")
# XLA:CPU compiles are ~1s even for trivial ops on small hosts; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/splat360_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
