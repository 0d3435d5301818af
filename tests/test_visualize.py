"""Visualization smoke tests (reference visualize.py / coverage_plot.py
roles): every plot constructs and renders to a file without error."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")

from slam_decomposition_tpu.utils import visualize as V


def test_plot_matrix(tmp_path):
    from slam_decomposition_tpu.models.gates import CNOT

    ax = V.plot_matrix(CNOT.to_numpy())
    ax.figure.savefig(tmp_path / "m.png")


def test_weyl_chamber_scatter(tmp_path):
    w = V.WeylChamberAxes()
    w.scatter(np.array([[0.5, 0, 0], [0.5, 0.5, 0.5]]), c="r")
    w.trajectory(np.array([[0, 0, 0], [0.25, 0.1, 0.05], [0.5, 0.2, 0.1]]))
    w.ax.figure.savefig(tmp_path / "w.png")


def test_unitary_to_weyl(tmp_path):
    from slam_decomposition_tpu.models.gates import CNOT, ISWAP

    w = V.unitary_to_weyl(CNOT.to_numpy(), ISWAP.to_numpy())
    w.ax.figure.savefig(tmp_path / "u.png")


def test_training_plot(tmp_path):
    losses = [np.geomspace(1, 1e-12, 50), np.geomspace(0.5, 1e-10, 80)]
    trajs = [np.random.default_rng(0).uniform(0, 0.5, (50, 3))]
    fig = V.optimizer_training_plot(losses, trajs, title="demo")
    fig.savefig(tmp_path / "t.png")


def test_coverage_plot(tmp_path):
    from slam_decomposition_tpu.coverage.coverage import gate_set_to_coverage
    from slam_decomposition_tpu.models import gates

    cov = gate_set_to_coverage(gates.cg_sqiswap())
    w = V.plot_coverage_set(cov)
    w.ax.figure.savefig(tmp_path / "c.png")


def test_candidate_scores_plot(tmp_path):
    params = [(0, 0, 0.3, 0.2, 1.0), (0, 0, 0.5, 0.1, 1.0)]
    scores = [(2.5, 2, 3), (2.2, 2, 3)]
    ax = V.plot_candidate_scores(params, scores, metric=0)
    ax.figure.savefig(tmp_path / "s.png")


def test_optimizer_history_feeds_plot(tmp_path):
    """use_callback captures per-iteration losses that feed the plot (the
    reference's optimizer.py:217-224 callback role)."""
    from slam_decomposition_tpu.models import gates
    from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
    from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer
    from slam_decomposition_tpu.opt.samplers import haar_sample

    opt = TemplateOptimizer(
        lambda k: build_ansatz(cycle_gates([gates.SQISWAP], k)),
        spanning_range=[3], training_restarts=2, override_fail=True,
        use_callback=True,
    )
    opt.approximate_from_distribution(haar_sample(2, seed=1))
    assert opt.training_history, "history not captured"
    hist = opt.training_history[0]
    assert hist.ndim == 3  # (B, R, iters)
    fig = V.optimizer_training_plot(list(hist[0]))
    fig.savefig(tmp_path / "h.png")


def test_hamiltonian_sweep_grid(tmp_path):
    """plotHamiltonianSweep parity (reference visualize.py:30-50):
    annotated heatmap with parameter labels."""
    vals = np.array([[0.1, 0.9], [0.55, 0.3]])
    labels = [
        [(0.0, 0.0), (0.0, 1.0)],
        [(1.0, 0.0), (1.0, 1.0)],
    ]
    fig = V.plot_hamiltonian_sweep(vals, labels=labels, title="sweep")
    fig.savefig(tmp_path / "sweep.png")


def test_live_update_chamber_scatter(tmp_path):
    """Live-update scatter parity (reference visualize.py:214-229): the
    same figure object is reused across updates."""
    w = V.coordinate_2dlist_weyl([[0.5, 0.0, 0.0]])
    fig0 = w.ax.figure
    w = V.update_coordinate_2dlist_weyl(
        w, [[0.25, 0.25, 0.0], [0.5, 0.5, 0.5]], colors=["m"]
    )
    assert w.ax.figure is fig0
    fig0.savefig(tmp_path / "live.png")
