"""Parallel-drive explorer (utils/playground.py) — pd_playground parity."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from slam_decomposition_tpu.utils.playground import ParallelDriveExplorer


def test_update_shapes_and_chamber_bounds():
    ex = ParallelDriveExplorer(N=4, R=3, t=0.8)
    segs = ex.update(q0=0.7, q1=0.3)
    assert segs.shape == (4, 3, 3)
    # folded into the half chamber (pd_playground.py:196-198)
    assert (segs[..., 0] <= 0.5 + 1e-9).all()
    assert np.isfinite(segs).all()
    assert ex.final_unitary.shape == (4, 4)
    # unitarity of the final prefix product
    np.testing.assert_allclose(
        ex.final_unitary @ ex.final_unitary.conj().T, np.eye(4), atol=1e-9
    )


def test_update_rejects_unknown_params():
    ex = ParallelDriveExplorer(N=2, R=2)
    with pytest.raises(TypeError):
        ex.update(bogus=1.0)


def test_compose_concatenates_trajectories():
    a = ParallelDriveExplorer(N=3, R=2)
    b = ParallelDriveExplorer(N=2, R=2)
    a.update(q0=0.5)
    b.update(q1=0.4)
    both = a.compose(b)
    assert both.shape == (5, 2, 3)
    # first block is exactly a's own trajectory
    np.testing.assert_allclose(both[:3], a.coordinate_list, atol=1e-12)


def test_plot_and_headless_interact_guard():
    ex = ParallelDriveExplorer(N=2, R=2)
    w = ex.plot()
    assert w.ax is not None
    with pytest.raises(RuntimeError, match="headless"):
        ex.interact()
