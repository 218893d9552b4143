"""Batched-native rollout: the seed/scene batch is an explicit leading axis.

The TPU production path for parameter sweeps (reference: N separate
processes, `experiments/trajectory_fitting/generate_jobs.py`). A plain
`jax.vmap(rollout)` pays two structural taxes on TPU:

1. every `lax.cond` executes BOTH branches per lane, so the substep-skip
   cond runs the full differentiable step for lanes whose frame is already
   covered (max_substeps x the necessary work), and
2. per-lane probe gating needs `jax.custom_batching.custom_vmap` wrappers,
   which do not compose with reverse-mode autodiff and force run-both +
   select at every gate (world._probe_ladder_gated's whole-batch cond only
   covers the ladder, not the substep loop).

Here the batch axis is explicit, so whole-batch `lax.cond`s are plain JAX:

- a substep runs only when ANY lane still has frame time to cover (free
  flight and resting contact finish in one substep, so substeps 2..S are a
  single skipped cond for the entire batch);
- the bisection ladder runs only when ANY lane rejects the rung-0 (full
  frame dt) probe — the probe itself is one lane-flattened kernel batch;
- inner per-lane physics reuses the same pure functions as the unbatched
  path (`world._probe_rungs` / `_replay_emit` / `finish_step` machinery)
  under `jax.vmap`, with bodies passed as explicit mapped operands.

This is also the shape that shards: the leading axis can carry a
`NamedSharding` over a device mesh, and the whole-batch `jnp.any`
reductions become XLA collectives (see parallel/sharding.py).

Per-lane FORCE parameters (e.g. sysid's optimized push magnitude) are
supported by passing `forces_b` — a batched force pytree (see
physics/forces.py registration), typically from
`make_world_batched(..., return_forces=True)` — to the batched entry
points; when omitted, `spec.forces` is broadcast (and must then hold no
per-lane traced leaves). `spec.joints` stay in the closure and must not
hold traced leaves (none of the built-in joints do — their rows are
functions of state only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .contacts import finish_contacts, find_contacts
from .engine import post_stabilization
from .world import (
    StepRecord,
    Trajectory,
    WorldSpec,
    WorldState,
    _accept_thresh,
    _contacts_any_valid,
    _empty_contacts_value,
    _integrate,
    _probe_rungs,
    _replay,
    _replay_emit_batched,
    _replay_values,
    _spec_with,
    _spec_with_bodies,
    _toc_recompute,
)


def _select_lanes(pred, a, b):
    """Per-lane select over pytrees with a leading batch axis."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred.reshape(pred.shape + (1,) * (x.ndim - 1)), x, y),
        a,
        b,
    )


def make_world_batched(build_fn, *batched_args, return_forces: bool = False):
    """Batch a world-building function over leading-axis arguments.

    ``build_fn(*args) -> (spec, state)`` is the usual single-world
    constructor (typically closing over unbatched config and calling
    ``make_world``). Returns ``(spec, bodies_b, state_b)`` where
    ``bodies_b``/``state_b`` carry a leading batch axis on every leaf and
    ``spec`` provides the (lane-uniform) static structure — pair tables,
    joints, forces, cfg. Lane 0's traced body leaves remain in
    ``spec.bodies`` but the batched entry points never read them.

    With ``return_forces=True`` the result is ``(spec, bodies_b, forces_b,
    state_b)`` where ``forces_b`` is the per-lane force pytree (leaves carry
    the batch axis; force objects whose parameters are python constants
    contribute no leaves and broadcast for free) — pass it as the batched
    entry points' ``forces_b`` so worlds with per-lane force parameters
    (sysid's Push) run the batched-native path."""

    def leaves(*a):
        spec, state = build_fn(*a)
        return spec.bodies, spec.forces, state

    bodies_b, forces_b, state_b = jax.vmap(leaves)(*batched_args)
    lane0 = jax.tree_util.tree_map(lambda x: x[0], batched_args)
    spec, _ = build_fn(*lane0)
    if return_forces:
        return spec, bodies_b, forces_b, state_b
    return spec, bodies_b, state_b


def _forces_arg(spec: WorldSpec, forces_b):
    """(operand, vmap axis) for the forces pytree: per-lane when provided,
    broadcast spec.forces otherwise."""
    if forces_b is None:
        return spec.forces, None
    return forces_b, 0


def _probe_batched(spec: WorldSpec, bodies_b, state_b, dt_frame_b,
                   forces_b=None):
    """Gradient-free bisection probe for the whole batch (reference
    world.py:344-356 per lane), MERGED first stage: rungs 0..ladder_stage1
    probe together for every lane in one lane-flattened kernel batch; the
    deep rungs run under a whole-batch cond only when some lane fails the
    shallow stage.

    An earlier version probed rung 0 alone and entered the rung-1.. ladder
    under a whole-batch cond on rejection — tuned for free flight. Measured
    on the bench bounce batch (benchmarks/diag_batch_rollout.py, B=16
    staggered radii): the ladder fires on 66% of executed substeps (some
    lane is always bouncing), so most substeps paid TWO sequential probe
    stages (launch + search glue each). The single-rollout path made the
    same trade for the same reason (world._probe_ladder: contact substeps
    dominate). The filter (finish_contacts) runs once on the selected rung
    instead of eagerly at rung 0."""
    sg = jax.lax.stop_gradient
    bodies_b = jax.tree_util.tree_map(sg, bodies_b)
    state_b = jax.tree_util.tree_map(sg, state_b)
    dt_frame_b = sg(dt_frame_b)
    cfg = spec.cfg
    mb = cfg.max_bisect
    s1 = max(min(cfg.ladder_stage1, mb), 0) if cfg.ladder_stage1 >= 0 else mb
    fr, fr_ax = _forces_arg(spec, forces_b)
    fr = jax.tree_util.tree_map(sg, fr)

    def rungs(lo, hi):
        def f(bd, frc, st, dtf):
            s = _spec_with(spec, bd, frc)
            return _probe_rungs(s, st, dtf, _accept_thresh(s, st), lo, hi)

        return jax.vmap(f, in_axes=(0, fr_ax, 0, 0))

    f1, k1, raw1, sol1 = rungs(0, s1)(bodies_b, fr, state_b, dt_frame_b)
    if s1 == mb:
        found, k, raw, sol = f1, k1, raw1, sol1
    else:

        def stay(_):
            return f1, k1, raw1, sol1

        def deep(_):
            f2, k2, raw2, sol2 = rungs(s1 + 1, mb)(
                bodies_b, fr, state_b, dt_frame_b
            )
            return _select_lanes(
                f1, (f1, k1, raw1, sol1), (f2, k2, raw2, sol2)
            )

        found, k, raw, sol = jax.lax.cond(jnp.all(f1), stay, deep, None)

    cc = jax.vmap(lambda r: finish_contacts(r, cfg))(raw)
    return k, found, jax.tree_util.tree_map(sg, (cc, sol))


def finish_step_batched(spec: WorldSpec, bodies_b, state_b, dt_frame_b, k_b,
                        ok_b, cache_b, forces_b=None):
    """Differentiable substep tail for the whole batch (world.finish_step per
    lane), with the TOC re-emission under a WHOLE-BATCH lax.cond.

    A vmapped finish_step turns the per-lane TOC cond into run-both-branches
    (cond->select under vmap), so every lane paid the gap jvp+vjp — forward
    AND backward — on every substep, including all of free flight and resting
    contact. Here the predicate reduces over lanes: only substeps where SOME
    lane gains a new contact (bounce frames) execute the vmapped TOC block;
    lanes without a new contact inside it are masked back by select, which is
    exactly what the old run-both path computed for them.

    In emission mode (cfg.replay_mode == "emit", world._replay_emit) the
    severed contact-value recompute is likewise hoisted under a whole-batch
    cond: free-flight/resting substeps (no lane selected a contact) emit the
    static empty buffer for the entire batch."""
    cfg = spec.cfg
    dtype = state_b.pos.dtype
    sg = jax.lax.stop_gradient
    fr, fr_ax = _forces_arg(spec, forces_b)

    # emission mode: severed contact VALUES for the whole batch, computed
    # outside the (possibly rematerialized) diff_block and under a
    # WHOLE-BATCH cond — free-flight/resting substeps (no lane selected a
    # contact) emit the static empty buffer for the entire batch
    emit_mode = cfg.replay_mode == "emit"  # "auto" -> inline here (see SimConfig)
    cts_val_b = None
    if emit_mode:
        dt_k0 = sg(dt_frame_b) * 0.5 ** k_b.astype(dtype)
        if cfg.time_of_contact_diff:
            use_pair0 = sg(state_b.had_toc)
        else:
            use_pair0 = jnp.zeros(dt_k0.shape, dtype=bool)
        ld = sg(state_b.last_dt)
        dt_val = jnp.where(use_pair0, -ld + (ld + dt_k0), dt_k0)
        cache_sg = jax.tree_util.tree_map(sg, cache_b)
        cc_b, _ = cache_sg
        state_sg = jax.tree_util.tree_map(sg, state_b)

        def rv(bd, st, d, ca):
            return _replay_values(_spec_with_bodies(spec, bd), st, d, ca)

        _, q2v_b, p2v_b = jax.vmap(rv)(bodies_b, state_sg, dt_val, cache_sg)
        anyv = jax.vmap(_contacts_any_valid)(cc_b)  # (B,)

        def have(_):
            def fc(bd, q, p, cc):
                bsg = jax.tree_util.tree_map(sg, bd)
                return find_contacts(
                    bsg, q, p, spec.directed_pairs, spec.n_unordered,
                    cfg, cache=cc,
                )

            return jax.vmap(fc)(bodies_b, q2v_b, p2v_b, cc_b)

        def none(_):
            B = state_b.pos.shape[0]
            e = _empty_contacts_value(spec, dtype, jnp.zeros((), dtype))
            eb = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), e
            )
            return eb.replace(max_pen_all=cc_b.max_pen_all)

        cts_val_b = jax.lax.cond(jnp.any(anyv), have, none, None)
        cts_val_b = jax.tree_util.tree_map(sg, cts_val_b)

    def diff_block(bodies_b, fr, state_b, dt_k_b, cache_b, cts_val_b):
        if cfg.time_of_contact_diff:
            use_pair = state_b.had_toc
        else:
            use_pair = jnp.zeros(dt_k_b.shape, dtype=bool)
        dt_p = -state_b.last_dt + (sg(state_b.last_dt) + dt_k_b)
        dt_ = jnp.where(use_pair, dt_p, dt_k_b)

        if emit_mode:
            new_v, q2, p2, contacts = _replay_emit_batched(
                spec, bodies_b, fr, fr_ax, state_b, dt_, cache_b, cts_val_b
            )
        else:

            def rep(bd, frc, st, d, ca):
                return _replay(_spec_with(spec, bd, frc), st, d, ca)

            new_v, q2, p2, contacts = jax.vmap(
                rep, in_axes=(0, fr_ax, 0, 0, 0)
            )(bodies_b, fr, state_b, dt_, cache_b)

        if cfg.time_of_contact_diff:
            pair_act = jnp.take_along_axis(
                state_b.contacts.pair_active, contacts.pair_id, axis=-1
            )
            toc_mask = contacts.valid & ~pair_act
            any_lane = jnp.any(toc_mask, axis=-1)  # (B,)
            op = (new_v, q2, p2, contacts, dt_, toc_mask)

            def toc_all(op):
                new_v, q2, p2, contacts, dt_, toc_mask = op

                def one(bd, frc, st, nv, q, p, ct, d, tm):
                    return _toc_recompute(
                        _spec_with(spec, bd, frc), st, nv, q, p, ct, d, tm
                    )

                q2t, p2t, dt_toc = jax.vmap(
                    one, in_axes=(0, fr_ax) + (0,) * 7
                )(
                    bodies_b, fr, state_b, new_v, q2, p2, contacts, dt_,
                    toc_mask
                )
                return _select_lanes(
                    any_lane, (q2t, p2t, dt_toc), (q2, p2, state_b.last_dt)
                )

            def no_toc(op):
                _, q2, p2, _, _, _ = op
                return q2, p2, state_b.last_dt

            q2, p2, last_dt = jax.lax.cond(jnp.any(any_lane), toc_all, no_toc, op)
            had_toc = any_lane
        else:
            last_dt = state_b.last_dt
            had_toc = jnp.zeros(dt_k_b.shape, dtype=bool)

        if cfg.post_stab:

            def ps(bd, q2, p2, nv, st, ct, ld, ht, dtk):
                s = _spec_with_bodies(spec, bd)
                dp = post_stabilization(
                    s.bodies, s.joints,
                    WorldState(q2, p2, nv, st.t, ct, ld, ht), ct, cfg,
                ).reshape(-1, 6) / 2.0
                q2n, p2n = _integrate(q2, p2, dp, dtk)
                ct2 = find_contacts(
                    s.bodies, q2n, p2n, s.directed_pairs, s.n_unordered, cfg
                )
                return q2n, p2n, ct2

            q2, p2, contacts = jax.vmap(ps)(
                bodies_b, q2, p2, new_v, state_b, contacts, last_dt, had_toc,
                dt_k_b,
            )

        return new_v, q2, p2, contacts, last_dt, had_toc

    if cfg.remat_replay:
        policy = (
            jax.checkpoint_policies.dots_saveable
            if cfg.remat_policy == "dots"
            else None
        )
        diff_block = jax.checkpoint(diff_block, policy=policy)

    dt_k_b = dt_frame_b * 0.5 ** k_b.astype(dtype)
    new_v, q2, p2, contacts, last_dt, had_toc = diff_block(
        bodies_b, fr, state_b, dt_k_b, cache_b, cts_val_b
    )

    new_state = WorldState(
        quat=q2, pos=p2, v=new_v, t=state_b.t + sg(dt_k_b),
        contacts=contacts, last_dt=last_dt, had_toc=had_toc,
    )
    rec = StepRecord(
        t=state_b.t, quat=q2, pos=p2, v=new_v,
        valid=jnp.ones(ok_b.shape, dtype=bool),
        bisect_failed=~ok_b, n_halvings=k_b,
    )
    return new_state, rec


def step_dt_batched(spec: WorldSpec, bodies_b, state_b, dt_frame_b,
                    forces_b=None):
    """One substep for the whole batch (see step_dt)."""
    k, ok, cache = _probe_batched(spec, bodies_b, state_b, dt_frame_b,
                                  forces_b=forces_b)
    return finish_step_batched(spec, bodies_b, state_b, dt_frame_b, k, ok,
                               cache, forces_b=forces_b)


def _skip_record(st: WorldState):
    B = st.pos.shape[0]
    return StepRecord(
        t=st.t,
        quat=st.quat,
        pos=st.pos,
        v=st.v,
        valid=jnp.zeros((B,), dtype=bool),
        bisect_failed=jnp.zeros((B,), dtype=bool),
        n_halvings=jnp.zeros((B,), dtype=jnp.int32),
    )


def step_frame_batched(spec: WorldSpec, bodies_b, state_b: WorldState,
                       forces_b=None):
    """One fixed-dt frame for the whole batch: substep until every lane's t
    reaches its end_t, bounded by cfg.max_substeps. Substeps where NO lane
    is active are one skipped whole-batch cond (in the vmap path they each
    paid a full run-both step)."""
    cfg = spec.cfg
    end_t = state_b.t + cfg.dt  # (B,)

    def sub(carry, _):
        st, had = carry
        remaining = end_t - st.t
        active = remaining > cfg.dt * 1e-6  # (B,)

        def do(_):
            dtf = jnp.maximum(remaining, cfg.dt * 1e-6)
            new_st, rec = step_dt_batched(spec, bodies_b, st, dtf,
                                          forces_b=forces_b)
            new_st = _select_lanes(active, new_st, st)
            rec = _select_lanes(active, rec, _skip_record(st))
            return new_st, rec._replace(valid=rec.valid & active)

        def skip(_):
            return st, _skip_record(st)

        new_st, rec = jax.lax.cond(jnp.any(active), do, skip, None)
        had = had | (active & jnp.any(new_st.contacts.valid, axis=-1))
        return (new_st, had), rec

    B = state_b.pos.shape[0]
    (state2, had_contacts), recs = jax.lax.scan(
        sub, (state_b, jnp.zeros((B,), dtype=bool)), None,
        length=cfg.max_substeps,
        unroll=min(cfg.substep_unroll, cfg.max_substeps),
    )
    truncated = (end_t - state2.t) > cfg.dt * 1e-6
    return state2, had_contacts, recs, truncated


def trajectory_lanes_first(traj: Trajectory) -> Trajectory:
    """Reorder a rollout_batched Trajectory ((T, S, B, ...) leaves,
    truncated (T, B)) to lanes-first (B, T, S, ...) so per-lane consumers
    (losses, plotting) can jax.vmap over it like a vmap(rollout) result."""
    mv2 = lambda x: jnp.moveaxis(x, 2, 0)
    mv1 = lambda x: jnp.moveaxis(x, 1, 0)
    return Trajectory(
        t=mv2(traj.t), quat=mv2(traj.quat), pos=mv2(traj.pos), v=mv2(traj.v),
        valid=mv2(traj.valid), bisect_failed=mv2(traj.bisect_failed),
        truncated=mv1(traj.truncated), n_halvings=mv2(traj.n_halvings),
    )


def rollout_batched(
    spec: WorldSpec,
    bodies_b,
    state_b: WorldState,
    n_frames: int,
    detach_2nd_bounce: bool = False,
    forces_b=None,
):
    """Scan n_frames batched frames. Trajectory leaves are (T, S, B, ...).

    detach_2nd_bounce follows the reference undo+re-run semantics per lane
    (world.rollout): the re-run frame is numerically identical, so running
    it for non-triggered lanes and selecting is exact; the whole-batch cond
    skips the re-run entirely when no lane triggers this frame."""
    if spec.cfg.remat_frames:
        ckpt = jax.checkpoint(
            lambda st: step_frame_batched(spec, bodies_b, st, forces_b=forces_b)
        )
        frame_fn = lambda st: ckpt(st)
    else:
        frame_fn = lambda st: step_frame_batched(
            spec, bodies_b, st, forces_b=forces_b
        )

    def frame(carry, _):
        st, n_contact_steps = carry
        pre = st
        st2, had_contacts, recs, truncated = frame_fn(st)

        if detach_2nd_bounce:
            n2 = n_contact_steps + had_contacts.astype(jnp.int32)
            trigger = had_contacts & (n2 > 1)  # (B,)
            sg = jax.lax.stop_gradient
            detached = WorldState(
                quat=sg(pre.quat),
                pos=sg(pre.pos),
                v=sg(pre.v),
                t=pre.t,
                contacts=jax.tree_util.tree_map(sg, pre.contacts),
                last_dt=sg(pre.last_dt),
                had_toc=pre.had_toc,
            )

            def redo(_):
                base = _select_lanes(trigger, detached, st)
                st3, _, recs3, trunc3 = frame_fn(base)
                # recs leaves are (S, B, ...): align the lane mask to axis 1
                recs_sel = jax.tree_util.tree_map(
                    lambda x, y: jnp.where(
                        trigger.reshape((1,) + trigger.shape + (1,) * (x.ndim - 2)),
                        x,
                        y,
                    ),
                    recs3,
                    recs,
                )
                return (
                    _select_lanes(trigger, st3, st2),
                    recs_sel,
                    jnp.where(trigger, trunc3, truncated),
                )

            def keep(_):
                return st2, recs, truncated

            st4, recs4, trunc4 = jax.lax.cond(jnp.any(trigger), redo, keep, None)
            n3 = jnp.where(trigger, 1, n2)
            return (st4, n3), (recs4, trunc4)

        return (st2, n_contact_steps), (recs, truncated)

    B = state_b.pos.shape[0]
    (final, _), (recs, truncated) = jax.lax.scan(
        frame, (state_b, jnp.zeros((B,), dtype=jnp.int32)), None,
        length=n_frames,
        unroll=min(spec.cfg.frame_unroll, n_frames),
    )
    traj = Trajectory(
        t=recs.t, quat=recs.quat, pos=recs.pos, v=recs.v, valid=recs.valid,
        bisect_failed=recs.bisect_failed, truncated=truncated,
        n_halvings=recs.n_halvings,
    )
    return final, traj
