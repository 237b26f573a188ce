import os

# Tests run hermetically on CPU with 8 virtual devices so multi-chip sharding
# paths can be exercised without TPU hardware.
#
# NOTE: this container's sitecustomize registers an `axon` TPU backend and
# pins JAX_PLATFORMS=axon for every interpreter, so the env var alone is not
# enough — we must also flip the platform through jax.config before any
# backend is initialized (conftest runs before test modules import jax ops).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the video-GAN critics program alone takes
# ~2.5 min of XLA:CPU compile; caching makes suite reruns fast.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
