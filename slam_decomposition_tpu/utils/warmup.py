"""Warmup orchestration: trace serially, compile concurrently.

The cold-start anatomy on the bench rig (docs/ROUND2_NOTES.md "Warm-up")
is ~60% host *tracing* (Python, GIL-bound, 1-core host) and ~40% backend
compile / persistent-cache deserialization (C++/RPC, releases the GIL).
Round 3 overlapped the two warmup chains with one thread each — a no-op,
because both chains spend most of their time tracing and the GIL
serializes that (VERDICT r3, weak #2). The schedule that actually
pipelines on a 1-core host is:

    for each executable (longest-compile first):
        trace it on the MAIN thread           (GIL-bound, serial anyway)
        hand the lowered artifact to a worker  (compile releases the GIL)
    join the workers

Total = sum(traces) + the last compile's tail, instead of
sum(traces) + sum(compiles).

:class:`ShapeDispatcher` makes this usable with jax's AOT API without
double-tracing: ``jit_fn.lower(args).compile()`` does NOT populate the
jit dispatch cache, so calling ``jit_fn(args)`` afterwards would trace
again.  The dispatcher holds the AOT-compiled executables keyed by
argument signature and falls back to the plain jit path for any
signature that was never warmed (tests, ad-hoc shapes). It also counts
those fallbacks: a benchmark can assert ``fallback_calls == 0`` after a
full-shape rehearsal — the "every timed-region shape must be warmed"
invariant whose violation caused the 21x BENCH_r03 regression
(VERDICT r3, weak #1).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Sequence, Tuple

import jax


def _sig(args):
    leaves = jax.tree_util.tree_leaves(args)
    return tuple(
        (tuple(getattr(a, "shape", ())), str(getattr(a, "dtype", type(a))))
        for a in leaves
    )


class ShapeDispatcher:
    """Wrap a jitted callable with an AOT-compiled fast path per shape.

    ``trace(*args)`` lowers at the given signature on the calling thread
    and returns a zero-argument compile job suitable for a worker thread.
    ``__call__`` routes to the AOT executable when the signature was
    warmed, else to the plain jit path (counted in ``fallback_calls``).
    """

    def __init__(self, jit_fn: Callable):
        self._fn = jit_fn
        self._compiled: dict = {}
        self.fallback_calls = 0

    def trace(self, *args) -> Callable[[], None]:
        lowered = self._fn.lower(*args)
        sig = _sig(args)

        def job():
            self._compiled[sig] = lowered.compile()

        return job

    def __call__(self, *args):
        c = self._compiled.get(_sig(args))
        if c is None:
            self.fallback_calls += 1
            return self._fn(*args)
        return c(*args)


def warm_all(
    plan: Sequence[Tuple[ShapeDispatcher, tuple]],
    max_workers: int = 2,
    log=None,
) -> None:
    """Trace every (dispatcher, example_args) serially (main thread);
    compile concurrently in ``max_workers`` background threads; join.

    Order the plan longest-compile-FIRST so the big compiles overlap the
    remaining traces and only the last (smallest) compile runs bare.
    """
    import time

    def timed(job, name):
        def run():
            t0 = time.time()
            job()
            if log is not None:
                # includes queue wait when all workers are busy
                log(f"compiled {name} in {time.time() - t0:.1f}s")

        return run

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = []
        for disp, args in plan:
            t0 = time.time()
            job = disp.trace(*args)
            name = str(_sig(args)[0][0])
            if log is not None:
                log(f"traced {name} in {time.time() - t0:.1f}s")
            futs.append(ex.submit(timed(job, name)))
        for f in futs:
            f.result()  # re-raises compile errors
