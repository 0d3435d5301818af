"""Chunk-plan semantics of bench.py's single-shape dispatch.

Round-3 redesign: ONE chunk shape per solver (the round-2 2.5k tail shape
cost an extra executable each, 40-125 s of compile-cache deserialization
per round — ROUND2_NOTES.md); partial chunks cycle the bucket's own
indices so pad lanes are extra restarts of real targets, and collect()
min-reduces duplicate indices.
"""

import numpy as np
import jax.numpy as jnp

import bench


class _StubAnsatz:
    n_params = 18


def _stub_solver(calls):
    """Records (idx, seed-ish) and returns a per-lane loss derived from the
    target's leading entry so duplicates are distinguishable per launch."""

    def solver(x0, tgt):
        # per-lane pseudo-loss: the target id encoded in tgt[0][:, 0, 0]
        # plus a per-launch offset from x0 (fresh key per launch)
        lane_id = np.asarray(tgt[0][:, 0, 0])
        offset = float(np.asarray(x0).ravel()[0]) * 1e-3
        calls.append(lane_id.copy())
        return None, jnp.asarray(lane_id + offset)

    return solver


def _targets(n):
    t0 = np.zeros((n, 4, 4))
    t0[:, 0, 0] = np.arange(n, dtype=float)
    return jnp.asarray(t0), jnp.asarray(np.zeros((n, 4, 4)))


def test_partial_chunk_cycles_real_indices(monkeypatch):
    monkeypatch.setattr(bench, "CHUNK", 8)
    calls = []
    T = _targets(20)
    idx = np.array([3, 5, 7, 11, 13, 15, 17, 19, 2, 4])  # 10 -> 8 + pad(8)
    import jax

    futs, _ = bench.launch_bucket(
        T, idx, _stub_solver(calls), _StubAnsatz(), jax.random.PRNGKey(0)
    )
    assert len(futs) == 2
    part0, _ = futs[0]
    part1, _ = futs[1]
    assert list(part0) == [3, 5, 7, 11, 13, 15, 17, 19]
    # tail: the 2 remaining indices cycled to fill the chunk — every pad
    # lane is a REAL index from this bucket (an extra restart), never junk
    assert list(part1) == [2, 4, 2, 4, 2, 4, 2, 4]
    assert set(part1) <= set(idx)


def test_collect_min_reduces_duplicates(monkeypatch):
    monkeypatch.setattr(bench, "CHUNK", 4)
    losses = np.full(6, np.inf)
    part = np.array([1, 2, 1, 2])
    bf = jnp.asarray(np.array([5.0, 9.0, 3.0, 11.0]))
    bench.collect(losses, [(part, bf)])
    assert losses[1] == 3.0  # min over the two lanes for index 1
    assert losses[2] == 9.0
    assert np.isinf(losses[0]) and np.isinf(losses[3])


def test_run_covers_every_target_and_rescues(monkeypatch):
    monkeypatch.setattr(bench, "CHUNK", 8)
    monkeypatch.setattr(bench, "RESTARTS", 2)
    import jax

    n = 12
    T = _targets(n)
    ks = np.array([2] * 7 + [3] * 5)
    calls = []

    class _Solver:
        """First pass: target 0 'fails' (loss 1.0); rescue pass returns
        tiny losses for everything it sees."""

        def __init__(self):
            self.n_calls = 0

        def __call__(self, x0, tgt):
            lane_id = np.asarray(tgt[0][:, 0, 0]).astype(int)
            calls.append(lane_id.copy())
            self.n_calls += 1
            if self.n_calls <= 2:  # the two first-pass buckets
                loss = np.where(lane_id == 0, 1.0, 1e-12)
            else:
                loss = np.full(len(lane_id), 1e-13)
            return None, jnp.asarray(loss)

    s = _Solver()
    losses = bench.run(T, n, jax.random.PRNGKey(0), s, _StubAnsatz(), s,
                       _StubAnsatz(), ks)
    assert (losses <= bench.THRESH).all()
    # rescue launched exactly once (target 0), padded by cycling
    assert s.n_calls == 3
    assert set(calls[-1]) == {0}


def test_mfu_flop_model_sane():
    from slam_decomposition_tpu.utils.mfu import (
        chain_flops,
        mfu_report,
        solve_flops_per_target,
    )

    assert chain_flops(3) > chain_flops(2) > 0
    # per-target work grows with k and with restarts
    assert solve_flops_per_target(3, 4) > solve_flops_per_target(2, 4)
    assert solve_flops_per_target(2, 8) > solve_flops_per_target(2, 4)
    import io

    buf = io.StringIO()
    out = mfu_report(
        B=1000,
        dt=1.0,
        t_ranges=0.2,
        ks=np.array([2] * 800 + [3] * 200),
        restarts=4,
        file=buf,
    )
    assert 0 < out["mfu_vs_vpu_f32"] < 1
    assert "mfu" in buf.getvalue()
