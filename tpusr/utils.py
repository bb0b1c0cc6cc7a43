"""Debug/diagnostics utilities (SURVEY.md §5 sanitizer row).

The reference has no sanitizers; the TPU-native equivalents are jax's NaN
checking and deterministic PRNG discipline, packaged here.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Enable jax debugging aids within a scope:
    - jax_debug_nans + jax_debug_infs: raise on the op producing the first
      NaN/Inf (infs need their own flag — jax_debug_nans alone lets a bf16
      overflow through silently);
    - optionally disable jit for python-level stepping.
    """
    prev_nans = jax.config.jax_debug_nans
    prev_infs = jax.config.jax_debug_infs
    try:
        jax.config.update("jax_debug_nans", bool(nans))
        jax.config.update("jax_debug_infs", bool(nans))
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_debug_infs", prev_infs)


def assert_all_finite(tree, name: str = "tree"):
    """Host-side finite check over a pytree (for tests/debug paths)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if not np.all(np.isfinite(arr)):
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(f"non-finite values in {name}:{keys}")
