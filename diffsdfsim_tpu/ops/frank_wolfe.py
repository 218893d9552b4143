"""Frank-Wolfe contact-point search over SDF surfaces.

TPU-native re-derivation of the reference `_frank_wolfe`
(`sdf_physics/physics3d/contacts.py:39-94`): for every triangle of body 1's
surface mesh (expressed in body 2's local frame), minimize body 2's SDF over
the triangle by 32 Frank-Wolfe iterations, tracking barycentric coordinates.

Redesign for fixed shapes: the reference gathers a dynamic candidate subset
of faces; here ALL faces are processed in lockstep with a candidate mask
(`cand`), updates masked per-face, and the reference's global early-stops
("all improvements below tol" / "found sdf < -tol, step will be rejected",
contacts.py:73-78) become a frozen `active` flag in the fori_loop carry.
Everything here runs gradient-free (the reference wraps FW in torch.no_grad,
contacts.py:255); gradients come from the differentiable contact recompute.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class FWResult(NamedTuple):
    abc: jnp.ndarray  # (F,3) barycentric coords of the per-face minimizer
    x: jnp.ndarray  # (F,3) minimizer in b2 local (metric) frame
    cand: jnp.ndarray  # (F,) candidate mask (centroid ball test)
    contact_mask: jnp.ndarray  # (F,) final contacts: cand & (sdf <= eps)
    sdfs: jnp.ndarray  # (F,) best-known sdf: init-corner sdf out of
    # frank_wolfe (NOT the minimizer's); exact sdf at x only after
    # finalize_fw re-queries


def frank_wolfe(
    verts_b2: jnp.ndarray,
    faces: jnp.ndarray,
    query_fn: Callable,
    eps: float,
    tol: float,
    iters: int = 32,
) -> FWResult:
    """Run FW for all faces of one directed pair. `verts_b2` are body-1
    surface vertices in body 2's local metric frame; `query_fn(pts) ->
    (sdfs, grads)` is body 2's metric local SDF (grads normalized)."""
    return frank_wolfe_multi([verts_b2[faces]], [query_fn], eps, tol, iters)[0]


def frank_wolfe_multi(
    pqr_segs: list,
    query_fns: list,
    eps: float,
    tol: float,
    iters: int = 32,
) -> list:
    """Run the FW searches of SEVERAL directed pairs in ONE fused loop.

    Each segment i is one directed pair: `pqr_segs[i]` (Fi,3,3) triangles in
    body-2-of-pair-i's local metric frame, `query_fns[i]` that body's SDF.
    The reference runs one `_frank_wolfe` call per directed pair
    (contacts.py:233-240); fusing them shares the sequential iteration chain
    (the TPU cost is per-op latency, not FLOPs) while keeping the exact
    per-pair early-stop semantics ("all improvements below tol" / "found
    sdf < -tol", contacts.py:73-78) through per-segment active flags.
    """
    n_seg = len(pqr_segs)
    sizes = [int(p.shape[0]) for p in pqr_segs]
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    pqr = jnp.concatenate(pqr_segs, axis=0)  # (F,3,3)
    nf = pqr.shape[0]
    f_idx = jnp.arange(nf)

    def query_all(x):
        outs = [
            fn(x[offs[i] : offs[i + 1]]) for i, fn in enumerate(query_fns)
        ]
        sdfs = jnp.concatenate([o[0] for o in outs])
        grads = jnp.concatenate([o[1] for o in outs])
        return sdfs, grads

    def seg_reduce(per_face, red):
        """Per-segment reduction -> (n_seg,) stacked."""
        return jnp.stack(
            [red(per_face[offs[i] : offs[i + 1]]) for i in range(n_seg)]
        )

    def seg_broadcast(per_seg):
        """(n_seg,) -> per-face via static segment tiling."""
        return jnp.concatenate(
            [jnp.broadcast_to(per_seg[i], (sizes[i],)) for i in range(n_seg)]
        )

    # candidate test: centroid sdf < face circumradius + eps (contacts.py:44-52)
    x0 = jnp.mean(pqr, axis=1)
    centr_sdfs, centr_grads = query_all(x0)
    rads = jnp.max(jnp.linalg.norm(x0[:, None, :] - pqr, axis=-1), axis=1)
    cand = (centr_sdfs < rads + eps) & (jnp.linalg.norm(centr_grads, axis=-1) > 1e-12)

    # init at the corner with smallest sdf (contacts.py:57-61)
    corner_sdfs = jnp.concatenate(
        [
            query_fns[i](pqr_segs[i].reshape(-1, 3))[0].reshape(sizes[i], 3)
            for i in range(n_seg)
        ]
    )
    init_ind = jnp.argmin(corner_sdfs, axis=1)
    x_init = pqr[f_idx, init_ind]
    abc_init = jax.nn.one_hot(init_ind, 3, dtype=pqr.dtype)

    # The reference breaks each pair's loop as soon as every face's
    # improvement is below tol or any penetration is found
    # (contacts.py:75-78) — typically after a handful of iterations, and
    # after ONE iteration when no face is a candidate (the common no-contact
    # frame). This runs gradient-free, so a dynamic-trip-count while_loop is
    # free to use and saves the bulk of the sequential per-frame op chain.
    def cond_fn(carry):
        it, x, abc, active = carry
        return jnp.any(active) & (it < iters)

    def body(carry):
        it, x, abc, active = carry
        sdfs, grads = query_all(x)
        # linear minimization oracle: corner minimizing grad . corner
        dpqr = jnp.einsum("fvc,fc->fv", pqr, grads)
        ind = jnp.argmin(dpqr, axis=1)
        s = pqr[f_idx, ind]

        gamma = 2.0 / (it.astype(x.dtype) + 2.0)
        impr = jnp.sum((x - s) * grads, axis=-1)
        gamma = gamma * (jnp.abs(impr) > tol).astype(x.dtype)
        gamma = jnp.where(cand, gamma, 0.0)

        # per-segment early stops (contacts.py:75-78)
        seg_stop = seg_reduce(gamma, lambda g: jnp.all(g == 0.0)) | seg_reduce(
            jnp.where(cand, sdfs, 0.0) < -tol, jnp.any
        )
        active = active & ~seg_stop

        g = jnp.where(seg_broadcast(active), gamma, 0.0)[:, None]
        x_new = (1.0 - g) * x + g * s
        abc_new = abc * (1.0 - g) + g * jax.nn.one_hot(ind, 3, dtype=abc.dtype)
        return it + 1, x_new, abc_new, active

    active0 = seg_reduce(cand, jnp.any)
    _, x, abc, _ = jax.lax.while_loop(
        cond_fn, body, (jnp.zeros((), jnp.int32), x_init, abc_init, active0)
    )

    results = []
    for i in range(n_seg):
        sl = slice(offs[i], offs[i + 1])
        results.append(
            FWResult(
                abc=abc[sl],
                x=x[sl],
                cand=cand[sl],
                contact_mask=cand[sl],
                sdfs=corner_sdfs[sl][jnp.arange(sizes[i]), init_ind[sl]],
            )
        )
    return results


def finalize_fw(
    res: FWResult,
    query_fn: Callable,
    eps: float,
    push_fn: Callable | None = None,
) -> FWResult:
    """Final surface push + contact test (contacts.py:84-94).

    `push_fn(abc) -> delta_x` implements the b1-surface projection when body 1
    is an SDF body (x moved by -sdf1 * R21 grad1)."""
    x = res.x
    if push_fn is not None:
        x = x + push_fn(res.abc)
    sdfs = query_fn(x)[0]
    contact_mask = res.cand & (sdfs <= eps)
    return FWResult(abc=res.abc, x=x, cand=res.cand, contact_mask=contact_mask, sdfs=sdfs)
