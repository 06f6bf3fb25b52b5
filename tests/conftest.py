import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware.  NOTE: under this environment's JAX 0.9 + axon
# plugin, the JAX_PLATFORMS / XLA_FLAGS *env vars* are ignored — only the
# config API works, and it must run before the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the sandbox has 2 vCPUs and XLA compiles
# dominate test time; cache compiled executables across pytest runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running lowering tests")
