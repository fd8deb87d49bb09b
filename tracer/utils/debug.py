"""Debug-build guards (SURVEY.md §5 'Race detection/sanitizers').

JAX's pure-functional model removes data races by construction; the risky
surfaces that remain are numerical (NaN/Inf escaping a kernel epilogue) and
indexing (out-of-bounds gathers clamping silently). `checked` wraps any
jittable render/step function with jax.experimental.checkify so those
conditions become hard errors in debug runs instead of silent bad pixels:

    run = make_render_fn(scene, cfg)
    dbg = checked(lambda s, c: run(s, c))
    img = dbg(scene, camera)   # raises on NaN/Inf/OOB

Used by tests/unit/test_debug_guards.py; production paths stay unchecked
(checkify adds guard code to every op it covers).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap `fn` so float_checks/index_checks raise checkify.JaxRuntimeError.

    Returns a jitted function with the same signature as `fn`.
    """
    errors = errors or (checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errors)

    @jax.jit
    def _inner(*args, **kwargs):
        return cfn(*args, **kwargs)

    def wrapper(*args, **kwargs):
        err, out = _inner(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
