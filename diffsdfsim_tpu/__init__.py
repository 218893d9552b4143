"""diffsdfsim_tpu — a TPU-native differentiable rigid-body simulator with SDF shapes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of DiffSDFSim
(EmbodiedVision/diffsdfsim, Strecke & Stueckler, 3DV 2021): rigid-body dynamics
with implicit (SDF) shape representations, a batched differentiable LCP/QP
contact solver, and gradients through the time of contact — redesigned for TPU:

- state is a pytree of fixed-shape arrays (SoA over bodies), never Python objects
- a simulation step is one jitted function; rollouts are ``lax.scan``
- contacts live in padded, masked buffers; all control flow is ``lax.cond`` /
  ``lax.while_loop`` / masking
- the LCP solver is a fixed-iteration Mehrotra predictor-corrector interior
  point method with implicit differentiation through the KKT conditions
  (``jax.custom_vjp``)
- meshes are fixed-topology template meshes Newton-projected onto SDF surfaces
  (differentiable w.r.t. shape parameters, replacing CUDA marching cubes)
- batching over optimization seeds / scenes is ``vmap``; multi-chip scaling is
  ``jax.sharding`` + jit over a device mesh.
"""

from . import config
from .config import Defaults, Defaults3D

__version__ = "0.1.0"
__all__ = ["config", "Defaults", "Defaults3D"]
