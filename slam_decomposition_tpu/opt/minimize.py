"""Device-resident L-BFGS with backtracking line search.

Replaces scipy.optimize.minimize(BFGS/L-BFGS-B, maxiter=2500) in the
reference's hot loop (optimizer.py:270-278). Differences by design:

  * exact autodiff gradients (scipy used ~n_params+1 finite-difference
    objective evals per iteration);
  * fully jit-compiled ``lax.while_loop`` — the entire optimization runs as
    one XLA program, so thousands of problems (targets x restarts) vmap into
    one device launch;
  * bounds via projection (L-BFGS-B behavior for the box constraints of
    basisv2.py:174-190), general inequality constraints via exterior
    penalty (SLSQP role, basisv2.py:192-199).

Fixed-memory two-loop recursion (m=8), Armijo backtracking, history reset on
line-search failure.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray


def lbfgs(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iters: int = 400,
    f_tol: float = 0.0,
    g_tol: float = 1e-12,
    memory: int = 8,
    max_backtracks: int = 30,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
) -> LBFGSResult:
    """Minimize fun from x0. Stops when f <= f_tol or ||g||_inf <= g_tol.

    vmap over a batch of x0 to run many problems concurrently (each lane
    masks off once converged).
    """
    n = x0.shape[-1]
    dtype = x0.dtype
    vg = jax.value_and_grad(fun)
    bounded = lower is not None

    def project(x):
        if not bounded:
            return x
        return jnp.clip(x, lower, upper)

    class State(NamedTuple):
        it: jnp.ndarray
        x: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        S: jnp.ndarray  # (m, n) s history
        Y: jnp.ndarray  # (m, n) y history
        rho: jnp.ndarray  # (m,)
        hist: jnp.ndarray  # number of valid entries
        gamma: jnp.ndarray  # initial Hessian scale
        done: jnp.ndarray

    f0, g0 = vg(x0)

    init = State(
        it=jnp.zeros((), jnp.int32),
        x=x0,
        f=f0,
        g=g0,
        S=jnp.zeros((memory, n), dtype),
        Y=jnp.zeros((memory, n), dtype),
        rho=jnp.zeros((memory,), dtype),
        hist=jnp.zeros((), jnp.int32),
        gamma=jnp.ones((), dtype),
        done=(f0 <= f_tol) | (jnp.max(jnp.abs(g0)) <= g_tol),
    )

    def two_loop(g, S, Y, rho, hist, gamma):
        """Standard two-loop recursion; masked ring buffer (newest last)."""
        q = g
        alphas = jnp.zeros((memory,), dtype)
        valid = (jnp.arange(memory) < hist)[::-1]  # newest first after flip

        def bwd(i, carry):
            q, alphas = carry
            idx = memory - 1 - i  # newest -> oldest
            a = rho[idx] * jnp.dot(S[idx], q)
            a = jnp.where(valid[i], a, 0.0)
            q = q - a * Y[idx]
            alphas = alphas.at[idx].set(a)
            return (q, alphas)

        q, alphas = jax.lax.fori_loop(0, memory, bwd, (q, alphas))
        r = gamma * q

        def fwd(i, r):
            idx = i  # oldest -> newest
            use = idx >= (memory - hist)
            b = rho[idx] * jnp.dot(Y[idx], r)
            r = r + jnp.where(use, (alphas[idx] - b), 0.0) * S[idx]
            return r

        r = jax.lax.fori_loop(0, memory, fwd, r)
        return r

    c1 = jnp.asarray(1e-4, dtype)

    def body(st: State) -> State:
        d = -two_loop(st.g, st.S, st.Y, st.rho, st.hist, st.gamma)
        # ensure descent; else steepest descent
        gd = jnp.dot(st.g, d)
        bad_dir = gd >= 0
        d = jnp.where(bad_dir, -st.g, d)
        gd = jnp.where(bad_dir, -jnp.dot(st.g, st.g), gd)

        def ls_body(carry):
            t, _, _, _ = carry
            xn = project(st.x + t * d)
            fn = fun(xn)
            ok = fn <= st.f + c1 * t * gd
            return (t * 0.5, xn, fn, ok)

        def ls_cond(carry):
            t, _, _, ok = carry
            return (~ok) & (t > 1e-20)

        t0 = jnp.asarray(1.0, dtype)
        x1 = project(st.x + t0 * d)
        f1 = fun(x1)
        ok0 = f1 <= st.f + c1 * t0 * gd
        t, xn, fn, ok = jax.lax.while_loop(
            ls_cond, ls_body, (t0 * 0.5, x1, f1, ok0)
        )
        del t
        # if line search failed entirely, keep x (will reset history)
        fail = ~ok
        xn = jnp.where(fail, st.x, xn)
        fn = jnp.where(fail, st.f, fn)
        gn = jax.grad(fun)(xn)

        s = xn - st.x
        y = gn - st.g
        sy = jnp.dot(s, y)
        good_pair = sy > 1e-14
        # ring-buffer shift (roll oldest out)
        S = jnp.where(good_pair, jnp.roll(st.S, -1, axis=0).at[-1].set(s), st.S)
        Y = jnp.where(good_pair, jnp.roll(st.Y, -1, axis=0).at[-1].set(y), st.Y)
        rho = jnp.where(
            good_pair, jnp.roll(st.rho, -1).at[-1].set(1.0 / jnp.maximum(sy, 1e-300)), st.rho
        )
        hist = jnp.where(good_pair, jnp.minimum(st.hist + 1, memory), st.hist)
        gamma = jnp.where(
            good_pair, sy / jnp.maximum(jnp.dot(y, y), 1e-300), st.gamma
        )
        # on line-search failure: wipe history (restart as steepest descent)
        hist = jnp.where(fail, 0, hist)
        gamma = jnp.where(fail, 1.0, gamma)

        done = (
            (fn <= f_tol)
            | (jnp.max(jnp.abs(gn)) <= g_tol)
            | (fail & (st.hist == 0))  # steepest-descent line search failed
        )
        return State(st.it + 1, xn, fn, gn, S, Y, rho, hist, gamma, done)

    def cond(st: State):
        return (~st.done) & (st.it < max_iters)

    final = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(
        x=final.x, f=final.f, n_iters=final.it, converged=final.f <= f_tol
    )


def multistart_lbfgs(
    fun,
    x0s: jnp.ndarray,
    **kw,
):
    """Run lbfgs from a batch of starts (..., n); returns batched results."""
    solver = functools.partial(lbfgs, fun, **kw)
    for _ in range(x0s.ndim - 1):
        solver = jax.vmap(solver)
    return solver(x0s)
