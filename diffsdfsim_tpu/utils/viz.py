"""Debug visualization: SDF slice plots.

Port of the reference `plot_sdf_slices` (`sdf_physics/physics3d/
utils.py:353-391`): sample an SDF on a res³ grid and plot axis-aligned
slices with optional contour lines. Matplotlib is imported lazily (it is a
debug tool, not a runtime dependency).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sample_sdf_volume(sdf_func, sdf_params, res=64):
    lin = jnp.linspace(-1.0, 1.0, res)
    pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    vals = sdf_func(pts.reshape(-1, 3), *sdf_params)
    return np.asarray(vals).reshape(res, res, res)


def plot_sdf_slices(res, n_slices, sdf_func, sdf_params, slice_dims=(0, 1, 2), plot_contours=()):
    import matplotlib.pyplot as plt

    sdfs = sample_sdf_volume(sdf_func, sdf_params, res=res)
    fig, axs = plt.subplots(nrows=n_slices, ncols=len(slice_dims), squeeze=False)
    for i in range(n_slices):
        for col, j in enumerate(slice_dims):
            idx = int(i / max(n_slices - 1, 1) * (sdfs.shape[j] - 1)) if n_slices > 1 else sdfs.shape[j] // 2
            sl = np.take(sdfs, idx, axis=j)
            if j > 0:
                sl = sl.T
            sl = sl[::-1]
            ax = axs[i][col]
            pos = ax.imshow(sl, cmap="seismic", vmin=-1, vmax=1)
            if plot_contours:
                cs = ax.contour(sl, levels=list(plot_contours), colors="black")
                ax.clabel(cs, inline=1, fontsize=10)
            ax.set_xticks([])
            ax.set_yticks([])
            fig.colorbar(pos, ax=ax, fraction=0.046)
    return fig
