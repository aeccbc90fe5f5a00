"""Verified placement of inputs into an executable's AUTO layouts.

The AUTO-input-layout optimization (compile with compiler-chosen input
layouts, feed batches already in those layouts, delete the in-step
relayout copy — docs/performance.md r4/r5) depends on actually being
able to PLACE arrays in a requested layout. Two stack quirks break the
naive version (both measured on chip, jax 0.9.0 + the axon TPU relay):

* ``jax.device_put(x, format)`` silently IGNORES a layout that differs
  from the transfer default (the array comes back default-laid-out and
  the AOT call raises a layout mismatch at dispatch);
* a jitted identity with ``out_shardings=formats`` works — but only
  with ``Format`` objects rebuilt around a concrete
  ``SingleDeviceSharding``, and only with the persistent compilation
  cache bypassed (the cache mis-keys identity functions across output
  formats and serves a stale executable with the wrong layouts).

``verified_put`` encapsulates the ladder: device_put when it sticks, a
cache-bypassed AOT relayout identity otherwise, None when nothing
places correctly (callers fall back to default-layout executables).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

Pytree = Any


def _matches(placed: Pytree, fmts: Pytree) -> bool:
    for got, want in zip(jax.tree.leaves(placed), jax.tree.leaves(fmts)):
        if want.layout is not None and \
                str(got.format.layout) != str(want.layout):
            return False
    return True


def verified_put(fmts: Pytree, example: Pytree) -> Optional[Callable]:
    """A function placing ``example``-shaped pytrees into ``fmts``
    (a pytree of ``jax.experimental.layout.Format``, e.g. one entry of
    ``compiled.input_formats``), VERIFIED on ``example``; None when the
    backend cannot realize the layouts."""
    from jax.experimental.layout import Format, Layout

    put = lambda b: jax.device_put(b, fmts)  # noqa: E731
    if _matches(put(example), fmts):
        return put

    from jax.sharding import SingleDeviceSharding

    sh = SingleDeviceSharding(jax.devices()[0])
    rebuilt = jax.tree.map(
        lambda f: Format(
            Layout(major_to_minor=f.layout.major_to_minor,
                   tiling=f.layout.tiling), sh)
        if f.layout is not None else Format(sharding=sh),
        fmts,
    )
    cache_flag = "jax_enable_compilation_cache"
    old = getattr(jax.config, cache_flag)
    jax.config.update(cache_flag, False)
    try:
        relayout = jax.jit(
            lambda b: b, out_shardings=rebuilt
        ).lower(example).compile()
    except Exception:
        return None
    finally:
        jax.config.update(cache_flag, old)
    put = lambda b: relayout(jax.device_put(b))  # noqa: E731
    if _matches(put(example), fmts):
        return put
    return None
