"""Contact-point polish: continuous refinement after the Frank-Wolfe search.

Why this exists (and why the reference does not have it): the reference
extracts every SDF body's surface as a res-128 marching-cubes mesh
(`sdf_physics/physics3d/bodies.py:653-664`), so its FW search over mesh
triangles localizes contact points to ~(extent/128) and measures penetration
essentially exactly. A TPU-native rebuild cannot afford tens of thousands of
faces per body inside a jitted probe ladder — we run FW over coarse meshes
(icosphere subdiv 2-3, a few hundred faces). FW's linear minimization oracle
then lands on mesh VERTICES (the floor-plane SDF is locally linear, so the
per-face minimizer is a corner), and the measured penetration is wrong by the
mesh sagitta, up to ~1e-2 * radius: shallow contacts are missed entirely,
the bisection ladder accepts penetrating steps, and parameter-sweep loss
landscapes pick up pose-dependent jitter the reference does not have
(RESULTS_TPU.md round-3 landscape comparison).

The fix is a polish stage that the mesh resolution cannot limit: starting
from each candidate face's FW point, run a fixed number of projected
tangential-descent iterations of body-2's SDF along body-1's *analytic*
surface (project to the sdf1 = 0 level set, step along the component of
grad sdf2 tangent to it, halve the step each iteration, keep the best
iterate). For smooth regions this converges geometrically to the true
contact point — sphere-on-plane penetration is recovered to ~1e-8 from a
320-face mesh — and on flat/edge regions (box resting on a face) the
tangential component vanishes, so patch contacts keep their spread. All
iterations are fixed-trip, masked, and batched over faces: TPU-friendly by
construction, and exact where the reference is merely finely discretized.

Gradient policy: the polish runs stop-gradient (like the FW search it
extends); the polished body-1-frame point is the ANCHOR consumed by the
differentiable contact recompute, which re-projects it onto body 1's surface
through the differentiable SDF (physics/contacts.py `_compute_contacts`) —
the same one-projection gradient structure the bary+push path has.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.quaternion import quat_apply, quat_invert, quat_multiply
from .sdf import _safe_norm


def polish_pair(
    x0_b2: jnp.ndarray,
    active: jnp.ndarray,
    step0: jnp.ndarray,
    bd1,
    q1,
    p1,
    bd2,
    q2,
    p2,
    iters: int,
):
    """Polish per-face contact points of one directed pair.

    Args:
      x0_b2: (F,3) FW output points in body 2's metric local frame (already
        surface-pushed when body 1 is an SDF body).
      active: (F,) bool, faces worth polishing (the FW candidate mask).
      step0: (F,) initial tangential step scale — the face circumradius,
        which bounds the FW point's distance to the true per-face optimum.
      bd1/bd2, q1/p1/q2/p2: BodyDefs and world poses (stop-gradient inputs).
      iters: fixed iteration count (cfg.contact_polish_iters).

    Returns (x1_best (F,3) body-1-frame anchors on body 1's surface,
    s2_best (F,) body-2 SDF at the anchors — the polished signed distance).
    """
    sg = jax.lax.stop_gradient
    x0_b2, active, step0 = sg(x0_b2), sg(active), sg(step0)
    q1, p1, q2, p2 = sg(q1), sg(p1), sg(q2), sg(p2)
    bd1 = jax.tree_util.tree_map(sg, bd1)
    bd2 = jax.tree_util.tree_map(sg, bd2)

    q12 = quat_multiply(quat_invert(q1), q2)  # b2-frame dirs -> b1 frame
    q21 = quat_multiply(quat_invert(q2), q1)
    t12 = quat_apply(quat_invert(q1), p2 - p1)  # b2 origin in b1 frame
    t21 = quat_apply(quat_invert(q2), p1 - p2)

    def to_b1(x):
        return quat_apply(q12, x) + t12

    def to_b2(x1):
        return quat_apply(q21, x1) + t21

    # baseline: project the FW point once and measure — inactive faces and
    # non-improving polish keep exactly this
    x1_0 = to_b1(x0_b2)
    s1_0, n1_0 = bd1.query_sdfs(x1_0)
    x1_base = x1_0 - s1_0[..., None] * n1_0
    s2_base = bd2.query_sdfs(to_b2(x1_base), return_grads=False)

    def body(k, carry):
        x, x1_best, s2_best = carry
        # project the iterate to body 1's surface (one Newton step on sdf1)
        x1 = to_b1(x)
        s1, n1b = bd1.query_sdfs(x1)
        x1p = x1 - s1[..., None] * n1b
        xp = to_b2(x1p)
        # measure body-2 SDF there; keep the best projected iterate
        s2, g2 = bd2.query_sdfs(xp)
        better = active & (s2 < s2_best)
        x1_best = jnp.where(better[..., None], x1p, x1_best)
        s2_best = jnp.where(better, s2, s2_best)
        # tangential descent: component of grad sdf2 orthogonal to body 1's
        # surface normal, with a geometrically shrinking step
        n1 = quat_apply(q21, n1b)
        t = g2 - jnp.sum(g2 * n1, axis=-1, keepdims=True) * n1
        tn = t / _safe_norm(t)[..., None]
        eta = step0 * (0.5 ** k.astype(x.dtype))
        x_new = xp - eta[..., None] * tn
        x_new = jnp.where(active[..., None], x_new, x)
        return x_new, x1_best, s2_best

    if iters > 0:
        _, x1_best, s2_best = jax.lax.fori_loop(
            0, iters, body, (x0_b2, x1_base, s2_base)
        )
    else:
        x1_best, s2_best = x1_base, s2_base
    return x1_best, s2_best
