"""Interactive parallel-drive explorer (pd_playground analog).

Reference: src/slam/utils/pd_playground.py — an ipywidget that rebuilds a
qiskit circuit per slider tick and re-evaluates Operator() per timestep to
draw the Weyl-chamber trajectory of a smush pulse. Here the whole
trajectory for a parameter setting is ONE jitted device call
(models/trajectory.smush_prefix_unitaries: associative_scan prefix
products + batched c1c2c3), so live dragging re-traces nothing on the
host, and the UI is plain matplotlib sliders (no notebook dependency):

    ex = ParallelDriveExplorer(N=10)
    ex.update(q0=0.3, q1=0.1)      # headless functional API -> (N, R, 3)
    ex.interact()                   # slider panel (needs a GUI backend)

``ImprovedCX``/``ImprovedSWAP`` preset trajectories are computed on demand
by the variational drive solver (models/trajectory.drive_pulse_for_target)
instead of the reference's hardcoded angle lists (pd_playground.py:247-339).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.models.trajectory import smush_prefix_unitaries
from slam_decomposition_tpu.ops import weyl


def _fold(coords: np.ndarray) -> np.ndarray:
    """Eliminate the x-axis mirror symmetry (pd_playground.py:196-198)."""
    c = np.array(coords, dtype=float)
    m = c[..., 0] > 0.5
    c[..., 0] = np.where(m, 1.0 - c[..., 0], c[..., 0])
    return c


class ParallelDriveExplorer:
    """Live Weyl-chamber trajectory of N repeated smush slices.

    Parameters mirror ParallelDrivenGateWidget.__init__
    (pd_playground.py:17-41): ``N`` atomic pulses of duration ``t/N``,
    conversion/gain strengths ``gc``/``gg`` with phases ``phi_c``/
    ``phi_g``, and per-qubit monochromatic drives ``q0``/``q1``.
    ``R`` is the in-slice time resolution (iterate_time's R): the pulse is
    Trotterized at N*R so each segment carries R points of the true path.
    """

    def __init__(self, N=10, gc=np.pi / 2, gg=0.0, t=1.0, R=5):
        self.N, self.gc, self.gg, self.t, self.R = N, gc, gg, t, R
        self.params = dict(q0=0.0, q1=0.0, phi_c=0.0, phi_g=0.0)
        self._fig = None
        self._artists = None

        def _traj(q0, q1, phi_c, phi_g):
            gx = jnp.full((N * R,), q0)
            gy = jnp.full((N * R,), q1)
            Us = smush_prefix_unitaries(phi_c, phi_g, gc, gg, gx, gy, t=t)
            return weyl.c1c2c3(Us), Us

        self._traj = jax.jit(_traj)
        self.coordinate_list: Optional[np.ndarray] = None
        self.final_unitary: Optional[np.ndarray] = None

    # ---- functional core -------------------------------------------------
    def update(self, **kw) -> np.ndarray:
        """Set any of q0/q1/phi_c/phi_g and recompute; returns segments
        (N, R, 3) — the reference's coordinate_list (iterate_time,
        pd_playground.py:179-208) — and refreshes an open figure in place
        (update_coordinate_2dlist_weyl role)."""
        unknown = set(kw) - set(self.params)
        if unknown:
            raise TypeError(f"unknown drive parameters: {sorted(unknown)}")
        self.params.update(kw)
        coords, Us = self._traj(**self.params)
        segs = _fold(np.asarray(coords)).reshape(self.N, self.R, 3)
        from slam_decomposition_tpu.ops import cplx

        self.coordinate_list = segs
        self.final_unitary = cplx.to_numpy((Us[0][-1], Us[1][-1]))
        if self._artists is not None:
            flat = segs.reshape(-1, 3)
            self._artists._offsets3d = (flat[:, 0], flat[:, 1], flat[:, 2])
            self._fig.canvas.draw_idle()
        return segs

    def compose(self, other: "ParallelDriveExplorer") -> np.ndarray:
        """Trajectory of self's pulse followed by other's (the reference's
        widget __add__, pd_playground.py:47-58): other's prefix products
        are left-multiplied onto self's final unitary."""
        a = self.update()
        _, Us_o = other._traj(**other.params)
        from slam_decomposition_tpu.ops import cplx

        U0 = cplx.from_numpy(self.final_unitary)
        tail = jax.vmap(lambda r, i: cplx.matmul((r, i), U0))(Us_o[0], Us_o[1])
        tail_c = _fold(np.asarray(weyl.c1c2c3(tail))).reshape(
            other.N, other.R, 3
        )
        return np.concatenate([a, tail_c], axis=0)

    # ---- UI --------------------------------------------------------------
    def plot(self, ax=None):
        """Scatter the current trajectory into a Weyl-chamber axes."""
        from slam_decomposition_tpu.utils.visualize import WeylChamberAxes

        if self.coordinate_list is None:
            self.update()
        w = WeylChamberAxes(ax=ax)
        flat = self.coordinate_list.reshape(-1, 3)
        col = np.repeat(np.arange(self.N), self.R)
        self._artists = w.ax.scatter(
            flat[:, 0], flat[:, 1], flat[:, 2], c=col, cmap="viridis", s=12
        )
        self._fig = w.ax.figure
        return w

    def interact(self):
        """Slider panel (matplotlib.widgets) — live parameter exploration.

        Needs an interactive backend; under Agg this raises with a pointer
        at the headless `update()` API instead of failing silently.
        """
        import matplotlib

        if matplotlib.get_backend().lower().startswith("agg"):
            raise RuntimeError(
                "interact() needs a GUI matplotlib backend; headless use: "
                "explorer.update(q0=..., q1=...) returns the segments"
            )
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Slider

        w = self.plot()
        fig = w.ax.figure
        fig.subplots_adjust(bottom=0.32)
        specs = [
            ("q0", 0, 2 * np.pi),
            ("q1", 0, 2 * np.pi),
            ("phi_c", 0, 2 * np.pi),
            ("phi_g", 0, 2 * np.pi),
        ]
        sliders = []
        for i, (name, lo, hi) in enumerate(specs):
            sax = fig.add_axes([0.2, 0.22 - 0.05 * i, 0.6, 0.03])
            s = Slider(sax, name, lo, hi, valinit=self.params[name])
            s.on_changed(
                lambda val, name=name: self.update(**{name: float(val)})
            )
            sliders.append(s)
        self._sliders = sliders  # keep refs alive
        plt.show()
        return sliders


def improved_cx_trajectory(n_slices=4, R=5, **kw):
    """Solved parallel-driven CX path + the 2-application baseline spline
    it beats (ImprovedCX, pd_playground.py:247-286). Returns
    (segments (n_slices, R, 3), baseline (2, 25, 3), loss)."""
    from slam_decomposition_tpu.models.trajectory import improved_cx

    x, loss, _locals = improved_cx(n_slices=n_slices, **kw)
    ex = ParallelDriveExplorer(N=n_slices, R=R)
    gx = jnp.repeat(jnp.asarray(x[2 : 2 + n_slices]), R)
    gy = jnp.repeat(jnp.asarray(x[2 + n_slices :]), R)
    Us = smush_prefix_unitaries(x[0], x[1], ex.gc, ex.gg, gx, gy, t=1.0)
    segs = _fold(np.asarray(weyl.c1c2c3(Us))).reshape(n_slices, R, 3)
    i = np.linspace(0.0, 1.0, 25)[:, None]
    baseline = np.stack(
        [
            np.concatenate([0.25 * i, 0.25 * i, 0 * i], axis=1),
            np.concatenate([0.25 + 0.25 * i, 0.25 - 0.25 * i, 0 * i], axis=1),
        ]
    )
    return segs, baseline, loss
