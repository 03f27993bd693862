"""Solution visualization (reference: src/util/trainer_util.py:187-470:
compare_plots_with_ground_truth, plot_model_time_series_new).

The reference projects NN output onto FEM dof coordinates and plots through
FEniCS; here ground truths are structured-grid pytrees, so plotting is plain
matplotlib over evaluation grids — no FEM dependency.

All functions are safe to call headless (Agg backend) and no-op gracefully
if matplotlib is missing.
"""

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    HAVE_MPL = False

import jax
import jax.numpy as jnp


def _eval_grid_2d(pde, params, gt, n=64, bounds=(-1.0, 1.0, -1.0, 1.0)):
    xmin, xmax, ymin, ymax = bounds
    xs = np.linspace(xmin, xmax, n)
    ys = np.linspace(ymin, ymax, n)
    xx, yy = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1),
                      jnp.float32)
    truth = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
    return pts, np.asarray(truth), xx, yy


def compare_plots_with_ground_truth(
    path, pde, model_and_lrs, gts_list, params_list, get_final_model,
    inner_steps_list=(0, 2, 5), n_tasks=3, bounds=(-1.0, 1.0, -1.0, 1.0),
    field_apply=None, step=None,
):
    """Grid of [task x (truth | k-step adapted model...)] heatmaps
    (reference trainer_util.py:187-292)."""
    if not HAVE_MPL:
        return None
    n_tasks = min(n_tasks, len(gts_list))
    ncols = 1 + len(inner_steps_list)
    fig, axes = plt.subplots(
        n_tasks, ncols, figsize=(3 * ncols, 3 * n_tasks), squeeze=False
    )
    key = jax.random.PRNGKey(0)
    for i in range(n_tasks):
        gt = gts_list[i]
        params = params_list[i]
        pts, truth, xx, yy = _eval_grid_2d(pde, params, gt, bounds=bounds)
        tshape = xx.shape if truth.ndim == 1 else xx.shape + (truth.shape[-1],)
        tplot = truth.reshape(tshape)
        if tplot.ndim == 3:
            tplot = np.linalg.norm(tplot, axis=-1)
        vmin, vmax = tplot.min(), tplot.max()
        axes[i][0].pcolormesh(xx, yy, tplot, vmin=vmin, vmax=vmax)
        axes[i][0].set_title("ground truth" if i == 0 else "")
        for j, k in enumerate(inner_steps_list):
            final = get_final_model(key, model_and_lrs, params, k)
            vals = np.asarray(field_apply(final, pts)).reshape(tplot.shape
                                                              if truth.ndim == 1
                                                              else tshape)
            if vals.ndim == 3:
                vals = np.linalg.norm(vals, axis=-1)
            axes[i][j + 1].pcolormesh(xx, yy, vals, vmin=vmin, vmax=vmax)
            axes[i][j + 1].set_title(f"{k} steps" if i == 0 else "")
    for ax_row in axes:
        for ax in ax_row:
            ax.set_xticks([])
            ax.set_yticks([])
    fname = f"{path}/viz_step_{step}.png" if step is not None else f"{path}/viz.png"
    fig.savefig(fname, dpi=160, bbox_inches="tight")
    plt.close(fig)
    return fname


def plot_burgers_time_series(
    path, pde, model_and_lrs, gt, params, get_final_model, inner_steps,
    field_apply, step=None, n_x=128,
):
    """(x, t) heatmaps: truth vs adapted model vs error (reference
    plot_model_time_series_new, trainer_util.py:389-470)."""
    if not HAVE_MPL:
        return None
    t_grid = np.asarray(gt.t_grid)
    xs = np.linspace(float(gt.x_grid[0]), float(gt.x_grid[-1]), n_x)
    xx, tt = np.meshgrid(xs, t_grid)
    pts = jnp.asarray(np.stack([xx.reshape(-1), tt.reshape(-1)], 1), jnp.float32)
    truth = np.asarray(
        jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
    ).reshape(xx.shape)
    final = get_final_model(jax.random.PRNGKey(0), model_and_lrs, params,
                            inner_steps)
    vals = np.asarray(field_apply(final, pts)).reshape(xx.shape)

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    for ax, data, title in zip(
        axes, [truth, vals, vals - truth], ["truth", "model", "error"]
    ):
        im = ax.pcolormesh(tt, xx, data, cmap="rainbow")
        ax.set_xlabel("t")
        ax.set_ylabel("x")
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
    fname = (f"{path}/viz_ts_step_{step}.png" if step is not None
             else f"{path}/viz_ts.png")
    fig.savefig(fname, dpi=160, bbox_inches="tight")
    plt.close(fig)
    return fname


def plot_burgers_time_series_gif(
    path, pde, model_and_lrs, gt, params, get_final_model, inner_steps,
    field_apply, step=None, n_x=128, frame_stride=5, duration_ms=80,
):
    """Per-timestep u(x) frames stitched into an animated gif (reference
    plot_model_time_series, trainer_util.py:295-386: per-t pngs -> gif)."""
    if not HAVE_MPL:
        return None
    try:
        from PIL import Image
    except Exception:
        return None
    import io

    t_grid = np.asarray(gt.t_grid)[::frame_stride]
    xs = np.linspace(float(gt.x_grid[0]), float(gt.x_grid[-1]), n_x)
    final = get_final_model(jax.random.PRNGKey(0), model_and_lrs, params,
                            inner_steps)

    frames = []
    ymin = float(np.min(np.asarray(gt.u_grid))) - 0.1
    ymax = float(np.max(np.asarray(gt.u_grid))) + 0.1
    for t in t_grid:
        pts = jnp.asarray(np.stack([xs, np.full_like(xs, t)], 1), jnp.float32)
        truth = np.asarray(
            jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
        )
        vals = np.asarray(field_apply(final, pts))
        fig, ax = plt.subplots(figsize=(4.5, 3))
        ax.plot(xs, truth, label="truth")
        ax.plot(xs, vals, "--", label="model")
        ax.set_ylim(ymin, ymax)
        ax.set_title(f"t = {float(t):.2f}")
        ax.legend(loc="upper right", fontsize=7)
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=100, bbox_inches="tight")
        plt.close(fig)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    fname = (f"{path}/viz_ts_step_{step}.gif" if step is not None
             else f"{path}/viz_ts.gif")
    frames[0].save(fname, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
    return fname
