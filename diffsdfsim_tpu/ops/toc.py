"""Time-of-contact (TOC) differential.

The paper's key contribution (reference `lcp_physics/physics/world.py:141-237`,
class ``World.H``): after a step that creates new contacts, the step size dt is
re-emitted through an identity function whose *backward* pass applies the
implicit function theorem to the contact gap function

    D(h, ·) = n₂ᵀ ( c₂ − R₂ₕᵀ (R₁ₕ c₁ + x₁ₕ − x₂ₕ) )

with constant-acceleration positions  xᵢₕ = xᵢ + h vᵢ + ½ aᵢ h²  and rotations
Rᵢₕ = exp(h ωᵢ) Rᵢ  (world.py:150-171). Gradients of the loss w.r.t. the
contact state then flow through dt:

    dL/dθ = −dL/dh · Σₖ wₖ ∂Dₖ/∂θ,     w = ∂D/∂h / Σₖ(∂Dₖ/∂h)²,

masking ∂Dₖ/∂h < TOL/h ("only motion into collision", world.py:204) and
zeroing when Σ(∂D/∂h)² ≤ 1e-5 (world.py:206-210).

TPU redesign: instead of `torch.autograd.functional.jacobian` over 12 inputs
(world.py:186-189), the backward is ONE `jax.jvp` (for ∂D/∂h) plus ONE
`jax.vjp` with cotangent −w·dL/dh (for every other input simultaneously).
Padded contact slots are handled by a validity mask folded into w.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.quaternion import so3_exp_map

TOC_TOL = 1e-6  # reference uses the 2D Defaults.TOL here (world.py:204)


class TocArgs(NamedTuple):
    """Per-contact state entering the gap function, all (K, ...) padded.

    cs1/cs2: contact points in each body frame *before* the step;
    vs1/vs2: 6-dim body velocities [omega, v]; poss/rots: body pose before
    the step (rots as 3x3 matrices, world frame); ns2: contact normal in
    body-2 frame; as1/as2: 6-dim accelerations (applied force / mass)."""

    cs1: jnp.ndarray  # (K,3)
    cs2: jnp.ndarray  # (K,3)
    vs1: jnp.ndarray  # (K,6)
    vs2: jnp.ndarray  # (K,6)
    poss1: jnp.ndarray  # (K,3)
    poss2: jnp.ndarray  # (K,3)
    rots1: jnp.ndarray  # (K,3,3)
    rots2: jnp.ndarray  # (K,3,3)
    ns2: jnp.ndarray  # (K,3)
    as1: jnp.ndarray  # (K,6)
    as2: jnp.ndarray  # (K,6)


def gap_function(h, a: TocArgs):
    """D(h, ·): (K,) signed gap at time offset h (reference world.py:150-171)."""
    dRi = so3_exp_map(h * a.vs1[:, :3])
    dRj = so3_exp_map(h * a.vs2[:, :3])
    Rih = dRi @ a.rots1
    Rjh = dRj @ a.rots2

    posih = a.poss1 + h * a.vs1[:, 3:] + 0.5 * a.as1[:, 3:] * h * h
    posjh = a.poss2 + h * a.vs2[:, 3:] + 0.5 * a.as2[:, 3:] * h * h

    cih_w = (Rih @ a.cs1[..., None])[..., 0] + posih
    cih_j = (jnp.swapaxes(Rjh, -1, -2) @ (cih_w - posjh)[..., None])[..., 0]
    return jnp.sum(a.ns2 * (a.cs2 - cih_j), axis=-1)


@jax.custom_vjp
def toc_dt(h, args: TocArgs, mask):
    """Identity on h; backward routes dL/dh into the contact state via the
    IFT on the gap function. `mask` (K,) bool marks valid TOC contacts."""
    return h


def _toc_fwd(h, args, mask):
    return h, (h, args, mask)


def _toc_bwd(res, dL_dh):
    h, args, mask = res
    h_sg = jax.lax.stop_gradient(h)
    args_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, args)

    # ∂D/∂h via one jvp
    _, dD_dh = jax.jvp(lambda hh: gap_function(hh, args_sg), (h_sg,), (jnp.ones_like(h_sg),))

    # only motion into collision (world.py:204) + padding mask
    dD_dh = jnp.where(dD_dh < TOC_TOL / h_sg, 0.0, dD_dh)
    dD_dh = jnp.where(mask, dD_dh, 0.0)

    denom = jnp.sum(dD_dh**2)
    w = jnp.where(denom > 1e-5, dD_dh / jnp.where(denom > 1e-5, denom, 1.0), 0.0)

    # all other gradients via one vjp with cotangent -w * dL/dh
    _, vjp_fn = jax.vjp(lambda a: gap_function(h_sg, a), args_sg)
    (d_args,) = vjp_fn(-w * dL_dh)

    return dL_dh, d_args, None


toc_dt.defvjp(_toc_fwd, _toc_bwd)
