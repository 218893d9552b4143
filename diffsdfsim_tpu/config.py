"""Simulation defaults and dtype policy.

Mirrors the reference's two-tier class-attribute config
(`lcp_physics/physics/utils.py:33-64` Defaults, overridden by
`sdf_physics/physics3d/utils.py:41-62` Defaults3D), re-expressed as plain
dataclass-style constant holders. The reference runs float64 on CUDA; on TPU
the native wide type is float32 (f64 is available in x64 mode on CPU for
parity testing). `default_dtype()` resolves the active policy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


class Defaults:
    """2D-core defaults (reference `physics/utils.py:33-64`)."""

    DIM = 2
    # Contact detection parameter
    EPSILON = 0.1
    # Penetration tolerance
    TOL = 1e-6
    RESTITUTION = 0.5
    FRIC_COEFF = 0.9
    FRIC_DIRS = 2
    DT = 1.0 / 30.0
    ENGINE = "PdipmEngine"
    CONTACT = "DiffContactHandler"
    POST_STABILIZATION = False


class Defaults3D(Defaults):
    """3D defaults (reference `physics3d/utils.py:41-62`)."""

    DIM = 3
    EPSILON = 1e-3
    TOL = 1e-8
    FRIC_DIRS = 8
    CONTACT = "FWContactHandler"
    CUSTOM_MESH = False
    CUSTOM_INERTIA = False


def default_dtype() -> jnp.dtype:
    """float64 when jax x64 mode is enabled (CPU parity tests), else float32."""
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (hashable) per-world simulation configuration.

    These are compile-time constants for the jitted step function — the
    analogue of the reference World.__init__ kwargs
    (`lcp_physics/physics/world.py:43-47`).
    """

    dt: float = Defaults.DT
    eps: float = Defaults3D.EPSILON
    tol: float = Defaults3D.TOL
    fric_dirs: int = Defaults3D.FRIC_DIRS
    post_stab: bool = False
    strict_no_penetration: bool = True
    time_of_contact_diff: bool = True
    stop_contact_grad: bool = False
    stop_friction_grad: bool = False
    detach_contact_b2: bool = False
    # solver
    solver_max_iter: int = 10  # reference engines.py:25
    solver_eps: float = 1e-12
    # PDIPM probe backend: "auto" (Pallas kernel on TPU, XLA elsewhere),
    # "pallas", or "xla". The Pallas kernel (ops/qp_pallas.py) fuses the
    # whole interior-point loop into one launch with the batch riding the
    # vector lanes; XLA's small batched linalg serializes over the batch.
    solver_backend: str = "auto"
    # backward (KKT implicit diff) backend: "auto" follows solver_backend,
    # "xla" forces the structured Cholesky+Woodbury path, "pallas" the fused
    # kernel (wins under vmap batching; at B=1 the padded kernel can lose)
    solver_bwd: str = "auto"
    # runtime accuracy fallback (reference INACC_ERR / CVXPY escape hatch,
    # lcp/solvers/batch.py:164-167): when any probe solve's KKT residual
    # exceeds the threshold, re-solve with solver_fallback_iters iterations
    # under a lax.cond (paid only when triggered). Off by default: doubles
    # the solver's compile footprint.
    solver_fallback: bool = False
    solver_fallback_iters: int = 30
    solver_fallback_thresh: float = 1e-3
    # Frank-Wolfe contact-search backend: "auto" (fused Pallas kernel on TPU
    # for analytic-SDF pairs, XLA elsewhere), "pallas" (forced; interpret
    # mode off-TPU — parity tests), or "xla". The kernel (ops/fw_pallas.py)
    # runs the whole per-pair search — candidate gate, 32 FW iterations,
    # surface push, contact quantities — in one launch with per-face state
    # resident in VMEM; the XLA path pays ~50 HBM-roundtrip ops per FW
    # iteration and is the bandwidth wall under probe-ladder x seed-batch
    # vmap. Grid/latent shapes always use the XLA path.
    fw_backend: str = "auto"
    # contact-point polish (ops/polish.py): fixed-trip projected tangential
    # descent refining each FW candidate point along body 1's analytic
    # surface. Recovers the exact contact point/penetration from coarse
    # meshes — the TPU-native replacement for the reference's res-128
    # marching-cubes surface meshes (bodies.py:653-664), whose fine
    # triangles give its FW search ~(extent/128) localization. 0 disables.
    contact_polish_iters: int = 10
    # stepping (fixed-shape bounds for data-dependent control flow)
    max_bisect: int = 10  # reference dt floor dt/2**10, world.py:345
    # probe rung 0 (the full frame dt) first and run the rest of the
    # bisection ladder only on rejection (lax.cond). Most substeps accept
    # rung 0, skipping ~max_bisect/(max_bisect+1) of the probe cost. Under
    # vmap a cond executes both branches per lane, so BATCHED sweep drivers
    # must set this False (bench --batch / run_sweep_hostloop do).
    ladder_fast_path: bool = True
    # whole-batch rung-0 gate for VMAPPED rollouts (world._probe_ladder_gated):
    # a custom_vmap probes rung 0 for all lanes together and runs the full
    # ladder only if any lane rejects. Opt-in because joints/forces stay in
    # the closure: only valid when they hold no per-lane traced parameters
    # (bodies/state are passed explicitly and batch correctly). Gravity +
    # constraint worlds (optim_sphere/shapespace/pointcloud, bench) qualify;
    # sysid's per-lane Push force does NOT.
    ladder_batch_gate: bool = False
    # staged bisection: probe rungs 0..ladder_stage1 first, the deep rungs
    # only when the shallow stage fails (world._probe_ladder_full /
    # batched._probe_batched). Nearly all halvings are k <= 2 on contact-rich
    # rollouts, so the full max_bisect+1-wide probe paid ~3x the necessary
    # kernel batch. -1 disables staging (single full-width probe).
    ladder_stage1: int = 2
    max_substeps: int = 8  # substeps per fixed-dt frame (scan bound)
    # rematerialize each frame in the rollout backward (jax.checkpoint):
    # trades recomputing the frame forward for not saving its residuals —
    # wins when the backward is HBM-bound on saved small tensors
    remat_frames: bool = False
    # differentiable-replay execution mode:
    # - "emit": the substep's forward pass re-emits the probe's cached
    #   VALUES (new_v from the cached primal-dual solution, poses by one
    #   integrate, contact values gradient-free and cond-skipped in free
    #   flight) through a custom_vjp whose backward runs the exact vjp of
    #   the inline replay. Numerically identical values and gradients;
    #   removes ~all of the replay's XLA glue from the forward pass (the
    #   round-4 profile's 1.2 ms batch-size-independent wall).
    # - "inline": on-tape replay (the parity reference).
    # - "auto" (default): measured per-path optimum — "emit" on the
    #   single-rollout path (TPU: 556 -> 721 steps/s fwd+bwd, the free
    #   forward dominates), "inline" on the batched-native path (the
    #   emission backward's extra linearization outweighs the forward
    #   saving once lanes amortize the glue: B=16 3831 vs 3704, B=64
    #   5246 vs 5157).
    replay_mode: str = "auto"
    # rematerialize each substep's differentiable replay block (replay +
    # contact recompute + TOC) in the backward. The replay forward is cheap
    # (the probe's cached LCP solution is re-emitted, no interior-point
    # iterations and no FW search run), while saving its interior produces
    # hundreds of tiny stacked residual arrays whose per-substep
    # dynamic-slice gathers dominate the scan transpose on TPU (measured:
    # backward was 74% of fwd+bwd step time). Recomputing the replay costs
    # ~one extra cheap forward and collapses the residuals to the substep
    # inputs.
    remat_replay: bool = True
    # jax.checkpoint policy for remat_replay: "none" saves only the block
    # inputs (full recompute), "dots" (dots_saveable) additionally saves
    # matmul results so the transpose skips recomputing them
    remat_policy: str = "none"
    # lax.scan unroll factors (TPU dispatch-overhead levers): the substep
    # scan is short (max_substeps), so unrolling it removes the per-substep
    # scan/transpose machinery and lets XLA fuse across substeps; the frame
    # scan is long — unrolling trades compile time for per-frame dispatch.
    # Both carry through scan's transpose, so they shrink the backward too.
    substep_unroll: int = 1
    frame_unroll: int = 1
    # contact buffers
    max_contacts_per_pair: int = 8
    max_contacts_total: int = 8  # global compacted buffer size
    # greedy normal-clustering rounds in contact filtering (the reference
    # clusters until every contact is assigned, physics3d/contacts.py:110-130;
    # this is the fixed-shape unroll bound for distinct contact-normal
    # directions per pair)
    max_filter_clusters: int = 4
    fw_iters: int = 32  # reference contacts.py:63
    # analytic 2D narrowphase (physics2d/narrowphase.py, reference 2D
    # DiffContactHandler: circle-circle / circle-hull GJK+SAT / hull-hull
    # SAT + incident-edge clipping) as the contact CANDIDATE generator for
    # planar worlds built from Circle/Rect/Hull bodies — replaces the
    # Frank-Wolfe mesh search per supported pair. Set by
    # physics2d.make_world_2d(narrowphase="analytic").
    narrowphase2d: bool = False
    # mesh extraction
    mesh_subdiv: int = 3  # icosphere template subdivisions for projection mesh
    mesh_project_iters: int = 12

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
