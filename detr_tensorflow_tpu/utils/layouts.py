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
  ``SingleDeviceSharding``, and only over a pytree containing JUST the
  leaves that need relayout: with the full mixed-dtype batch dict
  (float images/boxes + int32 classes + bool mask) XLA silently drops
  the layout assignment for some float outputs (isolated on chip:
  the identical images+boxes relayout succeeds as a 2-leaf tree and
  fails inside the 4-leaf tree). The relayout identity is therefore
  compiled over the mismatching subset only, with the persistent
  compilation cache bypassed for good measure.

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

    base_put = lambda b: jax.device_put(b, fmts)  # noqa: E731
    fmt_leaves, treedef = jax.tree.flatten(fmts)
    placed0 = treedef.flatten_up_to(base_put(example))
    bad = [
        i for i, (p, w) in enumerate(zip(placed0, fmt_leaves))
        if w.layout is not None and
        str(p.format.layout) != str(w.layout)
    ]
    if not bad:
        return base_put

    from jax.sharding import SingleDeviceSharding

    sh = SingleDeviceSharding(jax.devices()[0])
    rebuilt = tuple(
        Format(Layout(major_to_minor=fmt_leaves[i].layout.major_to_minor,
                      tiling=fmt_leaves[i].layout.tiling), sh)
        for i in bad
    )
    example_bad = tuple(treedef.flatten_up_to(example)[i] for i in bad)
    cache_flag = "jax_enable_compilation_cache"
    relayout = None
    err = None
    for _ in range(2):  # one retry: relay stalls drop compiles transiently
        old = getattr(jax.config, cache_flag)
        jax.config.update(cache_flag, False)
        try:
            relayout = jax.jit(
                lambda xs: xs, out_shardings=rebuilt
            ).lower(example_bad).compile()
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

    def put(b):
        leaves = treedef.flatten_up_to(base_put(b))
        fixed = relayout(tuple(leaves[i] for i in bad))
        for i, v in zip(bad, fixed):
            leaves[i] = v
        return jax.tree.unflatten(treedef, leaves)

    placed = treedef.flatten_up_to(put(example))
    detail = "; ".join(
        f"want {str(w.layout)} got {str(p.format.layout)}"
        for p, w in zip(placed, fmt_leaves)
        if w.layout is not None and str(p.format.layout) != str(w.layout)
    )
    if detail:
        raise RuntimeError(
            "backend ignored layouts even through the cache-bypassed "
            f"subset relayout identity: {detail}"
        )
    return put
