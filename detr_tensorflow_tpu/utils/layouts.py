"""Verified placement of inputs into an executable's AUTO layouts.

The AUTO-input-layout optimization (compile with compiler-chosen input
layouts, feed batches already in those layouts, delete the in-step
relayout copy — docs/performance.md r4/r5) depends on actually being
able to PLACE arrays in a requested layout. Two stack quirks break the
naive version (both measured on chip, jax 0.9.0 + the axon TPU relay):

* ``jax.device_put(x, format)`` silently IGNORES a layout that differs
  from the transfer default (the array comes back default-laid-out and
  the AOT call raises a layout mismatch at dispatch);
* a jitted identity with ``out_shardings=formats`` sometimes works —
  with ``Format`` objects rebuilt around a concrete
  ``SingleDeviceSharding`` and the persistent compilation cache
  bypassed — and sometimes silently yields transfer-default layouts
  for some float leaves (nondeterministic across processes; measured
  both ways with identical code). A subset-tree variant (relayout only
  the mismatching leaves) was tried and REMOVED: executing it left the
  backend in a state where the NEXT unrelated execution's results read
  back as INVALID_ARGUMENT (3/3 runs); the whole-tree variant never
  did that.

``verified_put`` encapsulates the ladder: device_put when it sticks, a
cache-bypassed subset relayout identity otherwise (with one retry —
relay stall episodes drop compiles transiently), and a RuntimeError
carrying the per-leaf mismatch detail when nothing places correctly
(callers catch and fall back to default-layout executables, with the
real reason in their warning).

Residual caveat, measured: even the subset relayout's applied layouts
are NONDETERMINISTIC across processes on this stack — the identical
code produced the requested batch-minor image layout in four isolated
repros and one full-Trainer run, and the transfer default in three
other full-Trainer runs. That is exactly why every rung is VERIFIED
against the example and the caller falls back instead of trusting the
API: the optimization engages when the stack cooperates and degrades
to the (correct, ~0.8 ms slower) default-layout step when it does not,
with the artifact recording which happened.
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
    ``compiled.input_formats``), VERIFIED on ``example``; raises
    RuntimeError (with per-leaf detail) when the backend cannot realize
    the layouts."""
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
    relayout = None
    err = None
    for _ in range(2):  # one retry: relay stalls drop compiles transiently
        old = getattr(jax.config, cache_flag)
        jax.config.update(cache_flag, False)
        try:
            relayout = jax.jit(
                lambda b: b, out_shardings=rebuilt
            ).lower(example).compile()
            break
        except Exception as e:
            err = e
        finally:
            jax.config.update(cache_flag, old)
    if relayout is None:
        raise RuntimeError(
            f"relayout identity failed to compile: "
            f"{type(err).__name__}: {err}"
        )
    put = lambda b: relayout(jax.device_put(b))  # noqa: E731
    placed = put(example)
    detail = "; ".join(
        f"want {str(w.layout)} got {str(p.format.layout)}"
        for p, w in zip(jax.tree.leaves(placed), jax.tree.leaves(fmts))
        if w.layout is not None and str(p.format.layout) != str(w.layout)
    )
    if detail:
        raise RuntimeError(
            "backend ignored layouts even through the cache-bypassed "
            f"relayout identity: {detail}"
        )
    return put
