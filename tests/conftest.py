"""Test configuration.

Tests run on a virtual 8-device CPU mesh with x64 enabled so the
deterministic golden values from the reference's f64 test-suite
(SURVEY.md §4/§6) can be reproduced exactly. TPU execution paths are the
same code — only dtype/backends differ.

NOTE: this environment preloads jax at interpreter startup (axon
sitecustomize), so env vars like JAX_PLATFORMS are too late here; we use
jax.config.update before any backend initialization instead.
"""

import os
import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite's cost is dominated by
# compiles of tiny-shape programs (distributed GN ~19 s each), which are
# identical run-to-run. Keyed by HLO hash, so code changes invalidate
# exactly the programs they touch. bench.py deliberately does NOT use
# this — it reports compile_s as a metric.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent.parent / ".jax_test_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: fall back to XLA flag (no-op if late)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

REFERENCE_DATASET = pathlib.Path(
    os.environ.get("RUSTROBOTICS_DATASET", "/root/reference/dataset")
)


@pytest.fixture(scope="session")
def dataset_dir():
    if not REFERENCE_DATASET.exists():
        pytest.skip("reference dataset directory not available")
    return REFERENCE_DATASET
