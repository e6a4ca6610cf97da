"""Interactive control visualizer — the static-matplotlib counterpart of the
reference's GLMakie ``ControlVisualizer`` extension (ext/ControlVisualizer.jl):
one slider per pcof entry, live control-envelope and state-population plots.

Requires an interactive matplotlib backend (notebook/Qt); in headless runs
use :func:`visualize_control_grid` which renders a static panel sweep.
"""

from __future__ import annotations

import numpy as np


def visualize_control(prob, controls, pcof0, *, order=4, npoints=201,
                      slider_range=1.0):
    """Launch a matplotlib-slider dashboard: sliders over pcof entries;
    redraws control envelopes and populations on change
    (ext/ControlVisualizer.jl's slider grid + live plots)."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Slider

    from ..controls import as_control_tuple, control_vector_slice, eval_p, eval_q
    from ..forward import eval_forward
    from .states import get_populations

    controls = as_control_tuple(controls)
    pcof0 = np.asarray(pcof0, dtype=np.float64)
    n = pcof0.size
    tf = float(prob.tf)
    ts = np.linspace(0, tf, npoints)

    fig = plt.figure(figsize=(10, 6))
    ax_ctrl = fig.add_axes([0.35, 0.55, 0.6, 0.4])
    ax_pop = fig.add_axes([0.35, 0.08, 0.6, 0.4])

    sliders = []
    for i in range(min(n, 16)):
        ax_s = fig.add_axes([0.05, 0.9 - i * 0.055, 0.2, 0.03])
        sliders.append(Slider(ax_s, f"p{i}", pcof0[i] - slider_range,
                              pcof0[i] + slider_range, valinit=pcof0[i]))

    def redraw(_=None):
        pc = pcof0.copy()
        for i, s in enumerate(sliders):
            pc[i] = s.val
        pcj = jnp.asarray(pc)
        ax_ctrl.clear()
        for ci, ctrl in enumerate(controls):
            local = control_vector_slice(pcj, controls, ci)
            ax_ctrl.plot(ts, [float(eval_p(ctrl, t, local)) for t in ts],
                         label=f"p{ci}")
            ax_ctrl.plot(ts, [float(eval_q(ctrl, t, local)) for t in ts],
                         "--", label=f"q{ci}")
        ax_ctrl.legend(fontsize=6)
        hist = eval_forward(prob, controls, pcj, order)
        pops = np.asarray(get_populations(hist))
        ax_pop.clear()
        for lev in range(pops.shape[1]):
            ax_pop.plot(pops[:, lev, 0], label=f"|{lev}>")
        ax_pop.legend(fontsize=6)
        fig.canvas.draw_idle()

    for s in sliders:
        s.on_changed(redraw)
    redraw()
    return fig, sliders


def visualize_control_grid(prob, controls, pcof0, *, param_index=0,
                           values=None, order=4):
    """Headless variant: sweep one pcof entry over ``values`` and render a
    panel of (controls, populations) per value. Returns the Figure."""
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from ..controls import as_control_tuple, control_vector_slice, eval_p
    from ..forward import eval_forward
    from .states import get_populations

    controls = as_control_tuple(controls)
    pcof0 = np.asarray(pcof0, dtype=np.float64)
    if values is None:
        v0 = pcof0[param_index]
        values = [v0 - 0.5, v0, v0 + 0.5]
    tf = float(prob.tf)
    ts = np.linspace(0, tf, 101)
    fig, axes = plt.subplots(2, len(values), squeeze=False, figsize=(9, 5))
    for col, val in enumerate(values):
        pc = pcof0.copy()
        pc[param_index] = val
        pcj = jnp.asarray(pc)
        for ci, ctrl in enumerate(controls):
            local = control_vector_slice(pcj, controls, ci)
            axes[0][col].plot(ts, [float(eval_p(ctrl, t, local)) for t in ts])
        hist = eval_forward(prob, controls, pcj, order)
        pops = np.asarray(get_populations(hist))
        for lev in range(pops.shape[1]):
            axes[1][col].plot(pops[:, lev, 0])
        axes[0][col].set_title(f"pcof[{param_index}]={val:.3g}", fontsize=8)
    return fig
