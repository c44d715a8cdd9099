"""Process-wide JAX configuration for stoat-tpu.

Importing this module (which every stats/pipeline module does first) enables
x64 mode: the association statistics must match a C++ double-precision oracle
to 4 significant digits, including extreme tails (p ~ 1e-300), which float32
cannot represent.  The FLOPs-heavy genotype-membership matmuls remain float32
— only the per-snarl statistics run in f64.
"""

import jax

jax.config.update("jax_enable_x64", True)


def ensure_backend() -> None:
    """Fall back to an auto-selected backend if the configured platform
    (e.g. the experimental ``axon`` TPU tunnel) failed to register."""
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


ensure_backend()
