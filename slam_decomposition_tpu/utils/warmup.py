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

import hashlib
import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Sequence, Tuple

import jax


def _sig(args):
    """Signature of an argument tree: (shape, dtype) per array leaf, and
    the VALUE for non-array leaves — a wrapped callable with static
    (value-sensitive) arguments must not route different static values to
    the executable compiled for the first one (advisor r4 low)."""
    leaves = jax.tree_util.tree_leaves(args)
    out = []
    for a in leaves:
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            out.append((tuple(a.shape), str(a.dtype)))
        else:
            out.append(("pyval", repr(a)))
    return tuple(out)


def code_version() -> str:
    """Hash of the source files that can shape a compiled program — the
    ExecCache key component that invalidates stored executables on code
    change, computed WITHOUT tracing (tracing is the warmup cost being
    avoided).

    Scope: models/, ops/, opt/, coverage/, parallel/ and this module.
    Deliberately EXCLUDES explore/, transpile/, the other utils and
    bench.py: those consume the jitted programs but contribute nothing
    to their HLO (bench's shape knobs are already in the key via the arg
    signature), so editing them must not throw away a 300 s warm state.
    Anything that builds an eval_fn/kernel/membership table lives in the
    hashed set."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    paths = [os.path.abspath(__file__).replace(".pyc", ".py")]
    for sub in ("models", "ops", "opt", "coverage", "parallel"):
        for dirpath, _, names in sorted(os.walk(os.path.join(pkg, sub))):
            for n in sorted(names):
                if n.endswith(".py"):
                    paths.append(os.path.join(dirpath, n))
    for p in paths:
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


class ExecCache:
    """Persistent COMPILED-executable store (serialize_executable pickles).

    The persistent XLA compile cache already skips recompilation, but a
    cache HIT still pays full host tracing (40-170 s per solver shape on
    this 1-core rig) plus executable deserialization keyed by a backend
    fingerprint that rotates with the remote pool worker (ROUND2_NOTES
    "Warm-up"). This cache stores the serialized COMPILED executable
    (jax.experimental.serialize_executable), so a hit skips BOTH tracing
    and the Mosaic compiler entirely. Unlike ``jax.export`` — whose
    StableHLO round trip re-legalizes the Pallas payload and crashes
    Mosaic (the round-2 dead end) — the compiled TPU binary is loaded
    as-is; an incompatible runtime/worker raises at load time, and
    callers fall back to the trace+compile path.

    Keys: (name, code_version(), arg signature). Files live under
    ``dir`` (default .jax_cache/exec), untracked like the compile cache.
    """

    def __init__(self, dir: str = None):
        if dir is None:
            root = os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            dir = os.path.join(root, ".jax_cache", "exec")
        self.dir = dir
        os.makedirs(dir, exist_ok=True)
        self._version = None

    def _path(self, name: str, sig) -> str:
        if self._version is None:
            self._version = code_version()
        key = hashlib.sha256(
            repr((name, self._version, sig)).encode()
        ).hexdigest()[:24]
        return os.path.join(self.dir, f"{name}-{key}.pkl")

    def load(self, name: str, sig):
        """-> loaded Compiled or None (missing / stale / incompatible)."""
        path = self._path(name, sig)
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                payload, in_tree, out_tree, dev_ids = pickle.load(f)
            # pin execution to the same-count device prefix: without this,
            # deserialize_and_load adopts ALL addressable devices and a
            # single-device program then demands N-sharded args (seen on
            # the 8-virtual-device CPU test mesh)
            devs = [jax.devices()[i] for i in dev_ids]
            return se.deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=devs
            )
        except Exception:
            # wrong worker / jax upgrade / truncated file: fall back to
            # trace+compile (which will overwrite the entry)
            try:
                os.remove(path)
            except OSError:
                pass
            return None

    def save(self, name: str, sig, compiled) -> None:
        try:
            from jax.experimental import serialize_executable as se

            payload, in_tree, out_tree = se.serialize(compiled)
            dev_ids = [d.id for d in compiled.runtime_executable().local_devices()]
            tmp = self._path(name, sig) + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, dev_ids), f)
            os.replace(tmp, self._path(name, sig))
        except Exception:
            pass  # serialization is best-effort; warmup correctness is not affected


class ShapeDispatcher:
    """Wrap a jitted callable with an AOT-compiled fast path per shape.

    ``trace(*args)`` lowers at the given signature on the calling thread
    and returns a zero-argument compile job suitable for a worker thread.
    ``__call__`` routes to the AOT executable when the signature was
    warmed, else to the plain jit path (counted in ``fallback_calls``).
    """

    def __init__(self, jit_fn: Callable, cache: "ExecCache" = None, name: str = None):
        self._fn = jit_fn
        self._compiled: dict = {}
        self.fallback_calls = 0
        self._cache = cache
        self._name = name or getattr(jit_fn, "__name__", "fn")

    def try_load(self, *args) -> bool:
        """Attempt to satisfy this signature from the ExecCache (no trace,
        no compile). Returns True and installs the executable on success."""
        if self._cache is None:
            return False
        sig = _sig(args)
        c = self._cache.load(self._name, sig)
        if c is None:
            return False
        self._compiled[sig] = c
        return True

    def trace(self, *args) -> Callable[[], None]:
        lowered = self._fn.lower(*args)
        sig = _sig(args)

        def job():
            c = lowered.compile()
            self._compiled[sig] = c
            if self._cache is not None:
                self._cache.save(self._name, sig, c)

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

    def timed(job, what):
        def run():
            t0 = time.time()
            job()
            if log is not None:
                # includes queue wait when all workers are busy
                log(f"{what} in {time.time() - t0:.1f}s")

        return run

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = []
        for disp, args in plan:
            t0 = time.time()
            name = str(_sig(args)[0][0])
            # ExecCache first: a hit installs the compiled executable with
            # no tracing and no compile (the two warmup cost centers).
            # deserialize_and_load DEFERS the remote device load to the
            # first invocation (~40-120 s per executable through this
            # rig's tunnel, measured as a serial rehearsal stall in the
            # round-5 exec-cache bringup) — so force it HERE, one dummy
            # invocation per executable, concurrently in the pool.
            if getattr(disp, "try_load", None) and disp.try_load(*args):

                def load_job(d=disp, a=args):
                    import jax as _jax

                    # hard sync via device_get: block_until_ready has been
                    # observed returning EARLY on the axon relay
                    # (docs/profile_solver.md timing-protocol note), which
                    # would leave the real load to the next caller
                    out = d(*a)
                    _jax.device_get(_jax.tree_util.tree_leaves(out)[-1])

                if log is not None:
                    log(f"exec-cache hit {name} in {time.time() - t0:.1f}s")
                futs.append(ex.submit(timed(load_job, f"loaded {name}")))
                continue
            job = disp.trace(*args)
            if log is not None:
                log(f"traced {name} in {time.time() - t0:.1f}s")
            futs.append(ex.submit(timed(job, f"compiled {name}")))
        for f in futs:
            f.result()  # re-raises compile errors
