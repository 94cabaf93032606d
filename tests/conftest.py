"""Test harness setup: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (mirrors the driver's dryrun).

NOTE: the environment may pre-set JAX_PLATFORMS=axon (a remote TPU tunnel);
running the whole suite over that tunnel makes every compile take tens of
seconds. We override unconditionally and also use jax.config.update, which
wins even if the env var was already consumed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as _graft  # noqa: E402

try:  # persistent compile cache shaves minutes off repeat suite runs;
    # keyed per host CPU — foreign XLA:CPU AOT artifacts risk SIGILL.
    jax.config.update("jax_compilation_cache_dir", _graft._cpu_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass
