"""Opt-in debug mode: the TPU analog of the reference's sanitizer builds.

The reference offers opt-in TSAN/ASAN Debug builds (CMakeLists.txt:186-196)
to catch data races and memory errors in the worker pool. The functional
JAX model has no data races to sanitize; the corresponding failure classes
here are numerical (NaN/Inf leaking through masked lanes) and shape/index
bugs that XLA's optimizer can mask. Debug mode turns on:

  * jax_debug_nans / jax_debug_infs — fail loudly at the producing op
    instead of returning poisoned results;
  * jax_disable_most_optimizations — keep programs close to the traced
    graph so failures localize.

Enable via QUAKE_TPU_DEBUG=1 in the environment (before importing compute
modules) or by calling enable_debug_mode(). CI runs the smoke subset with
it on (build_and_test.yaml).

NOTE: the production scan kernels legitimately use -inf as the
masked-lane/empty-result sentinel, so debug mode whitelists infs by default
and only traps NaNs; set QUAKE_TPU_DEBUG_INFS=1 to trap infs too (only
meaningful for flat/unmasked paths).
"""

from __future__ import annotations

import os


def enable_debug_mode(trap_infs: bool | None = None) -> None:
    import jax

    jax.config.update("jax_debug_nans", True)
    if trap_infs is None:
        trap_infs = os.environ.get("QUAKE_TPU_DEBUG_INFS", "") == "1"
    if trap_infs:
        jax.config.update("jax_debug_infs", True)
    try:
        jax.config.update("jax_disable_most_optimizations", True)
    except Exception:  # flag name varies across jax versions
        pass


def disable_debug_mode() -> None:
    import jax

    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    try:
        jax.config.update("jax_disable_most_optimizations", False)
    except Exception:
        pass


if os.environ.get("QUAKE_TPU_DEBUG", "") == "1":  # pragma: no cover
    enable_debug_mode()
