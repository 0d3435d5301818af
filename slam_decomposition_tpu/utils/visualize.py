"""Visualization (reference src/slam/utils/visualize.py + coverage_plot.py).

Matplotlib host-side rendering: matrix heatmaps, optimizer-convergence
plots, Weyl-chamber scatter/trajectory views, and coverage-polytope hulls.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np


def _require_mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_matrix(U, ax=None):
    """Magnitude/phase heatmap of a unitary (visualize.py:12-27)."""
    plt = _require_mpl()
    U = np.asarray(U)
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(np.abs(U), cmap="viridis")
    for (i, j), v in np.ndenumerate(U):
        if abs(v) > 1e-3:
            ax.text(j, i, f"{np.angle(v):.2f}", ha="center", va="center", fontsize=7)
    plt.colorbar(im, ax=ax)
    return ax


class WeylChamberAxes:
    """3D Weyl chamber renderer (weylchamber.WeylChamber role)."""

    VERTICES = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], [0.5, 0.5, 0.5]]
    )
    EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

    def __init__(self, ax=None):
        plt = _require_mpl()
        if ax is None:
            fig = plt.figure()
            ax = fig.add_subplot(111, projection="3d")
        self.ax = ax
        self.draw_chamber()

    def draw_chamber(self):
        ax = self.ax
        for (i, j) in self.EDGES:
            seg = self.VERTICES[[i, j]]
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "k-", lw=0.5)
        for label, v in zip("O A1 A2 A3".split(), self.VERTICES):
            ax.text(*v, label)
        ax.set_xlabel("c1")
        ax.set_ylabel("c2")
        ax.set_zlabel("c3")

    def scatter(self, coords, **kw):
        coords = np.atleast_2d(np.asarray(coords))
        self.ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2], **kw)
        return self.ax

    def trajectory(self, coords, **kw):
        coords = np.asarray(coords)
        self.ax.plot(coords[:, 0], coords[:, 1], coords[:, 2], **kw)
        return self.ax


def unitary_to_weyl(*unitaries, c="r"):
    """Scatter unitaries in the chamber (visualize.py:232-240)."""
    import jax

    from slam_decomposition_tpu.ops import cplx, weyl

    with jax.default_device(jax.devices("cpu")[0]):
        coords = np.asarray(weyl.c1c2c3(cplx.from_numpy(np.stack(unitaries))))
    w = WeylChamberAxes()
    w.scatter(coords, c=c)
    return w


def optimizer_training_plot(losses, coordinate_trajectories=None, title=""):
    """Loss convergence (log scale) + optional chamber trajectory
    (visualize.py:58-135; per-restart segments are separate lists here
    instead of the reference's -1 sentinel encoding)."""
    plt = _require_mpl()
    if coordinate_trajectories:
        fig = plt.figure(figsize=(10, 4))
        ax1 = fig.add_subplot(121)
        ax2 = fig.add_subplot(122, projection="3d")
        w = WeylChamberAxes(ax2)
        for traj in coordinate_trajectories:
            w.trajectory(np.asarray(traj), lw=1)
    else:
        fig, ax1 = plt.subplots()
    for seg in losses:
        ax1.semilogy(np.maximum(np.asarray(seg), 1e-16))
    ax1.set_xlabel("iteration")
    ax1.set_ylabel("loss")
    ax1.set_title(title)
    return fig


def coordinate_2dlist_weyl(*coord_lists, colors=None, no_bar=False):
    """Layered coordinate scatter (visualize.py:168-211)."""
    w = WeylChamberAxes()
    for i, coords in enumerate(coord_lists):
        if len(coords) == 0:
            continue
        kw = {}
        if colors is not None:
            kw["c"] = colors[i % len(colors)]
        w.scatter(np.asarray(coords), s=4, **kw)
    return w


def plot_hamiltonian_sweep(
    matrix, title="Hamiltonian Sweep", labels=None, rounder=2, vmin=0, vmax=1
):
    """Annotated heatmap of a 2D Hamiltonian-parameter sweep
    (plotHamiltonianSweep, reference visualize.py:30-50): |value| colormap
    with each cell annotated by its rounded value; ``labels`` follows the
    reference's convention of a grid of (row, col) parameter pairs."""
    plt = _require_mpl()
    arr = np.asarray(matrix)
    fig, ax = plt.subplots(figsize=(7, 7))
    pm = ax.imshow(np.abs(arr), interpolation="nearest", vmin=vmin, vmax=vmax)
    ax.set_title(title)
    if labels is not None:
        m_labels = np.arange(arr.shape[1])
        n_labels = np.arange(arr.shape[0])
        ax.set_xticks(m_labels)
        ax.set_xticklabels([labels[0][n][1] for n in m_labels])
        ax.set_yticks(n_labels)
        ax.set_yticklabels([labels[n][0][0] for n in n_labels])
    for (j, i), val in np.ndenumerate(arr):
        ax.text(i, j, np.round(val, rounder), ha="center", va="center")
    fig.colorbar(pm, ax=ax)
    return fig


def update_coordinate_2dlist_weyl(w, *coord_lists, colors=None):
    """Live-update variant of :func:`coordinate_2dlist_weyl` (reference
    visualize.py:214-229): clear the chamber axes and re-scatter, reusing
    the same figure — for notebook-style monitoring of a running sweep.
    ``w`` is the WeylChamberAxes returned by the initial call."""
    w.ax.cla()
    w.draw_chamber()
    for i, coords in enumerate(coord_lists):
        if len(coords) == 0:
            continue
        kw = {}
        if colors is not None:
            kw["c"] = colors[i % len(colors)]
        w.scatter(np.asarray(coords), s=4, **kw)
    w.ax.figure.canvas.draw_idle()
    return w


def plot_coverage_set(coverage, ax=None):
    """Coverage polytopes as convex hulls in the chamber
    (coverage_plot.py:14-32): per layer, enumerate subpolytope vertices
    (exact), convert monodromy->canonical, render scipy hulls."""
    from scipy.spatial import ConvexHull

    plt = _require_mpl()
    w = WeylChamberAxes(ax)
    cmap = plt.get_cmap("viridis")
    layers = [cp for cp in coverage if cp.cost > 0]
    for li, cp in enumerate(layers):
        pts = []
        for sub in cp.polytope.convex_subpolytopes:
            for v in sub.vertices():
                a = np.array([float(x) for x in v])
                # monodromy -> positive canonical (first chamber image)
                x = a[0] + a[1]
                y = a[0] + a[2]
                z = a[1] + a[2]
                pts.append([x, y, z])
        if len(pts) < 4:
            if pts:
                w.scatter(np.asarray(pts), c=[cmap(li / max(len(layers) - 1, 1))])
            continue
        pts = np.asarray(pts)
        try:
            hull = ConvexHull(pts, qhull_options="QJ")
            for s in hull.simplices:
                s = np.append(s, s[0])
                w.ax.plot(
                    pts[s, 0], pts[s, 1], pts[s, 2],
                    c=cmap(li / max(len(layers) - 1, 1)), lw=0.6, alpha=0.6,
                )
        except Exception:
            w.scatter(pts, c=[cmap(li / max(len(layers) - 1, 1))])
    return w


def plot_candidate_scores(params_list, scores_list, metric: int = 0, ax=None):
    """Candidate design-space scatter colored by score
    (bare_candidates.py:128-148)."""
    plt = _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    x = [p[2] for p in params_list]
    y = [p[3] for p in params_list]
    z = [s[metric] for s in scores_list]
    sc = ax.scatter(x, y, s=80, c=z)
    ax.set_xlabel("conv")
    ax.set_ylabel("gain")
    plt.colorbar(sc, ax=ax, label=["E[haar]", "D[CNOT]", "D[SWAP]"][metric])
    return ax
