"""Process-wide JAX configuration for stoat-tpu.

Importing this module (which every stats/pipeline module does first) enables
x64 mode: the association statistics must match a C++ double-precision oracle
to 4 significant digits, including extreme tails (p ~ 1e-300), which float32
cannot represent.  The FLOPs-heavy genotype-membership matmuls remain float32
— only the per-snarl statistics run in f64.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the axon TPU's remote compile server is
# shared and its latency varies from seconds to minutes for the same HLO
# (measured: chi2_2xn at B=100k compiled in 9s..350s depending on the
# moment).  Caching the executable on disk makes every shape compile
# once ever; batch shapes are padded to powers of two throughout the
# pipelines to keep the shape set small.
_cache_dir = os.environ.get(
    "STOAT_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "stoat_tpu",
                 "jax_cache"))
if _cache_dir and _cache_dir != "0":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # older jax or read-only home
        pass


def ensure_backend() -> None:
    """Fall back to an auto-selected backend if the configured platform
    (e.g. the experimental ``axon`` TPU tunnel) failed to register."""
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


ensure_backend()
