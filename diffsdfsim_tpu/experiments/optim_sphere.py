"""Trajectory fitting: recover a sphere's radius from an observed bounce.

Re-creation of the reference experiment
`experiments/trajectory_fitting/optim_sphere.py`: a sphere is dropped/thrown
in a room (floor + wall, TotalConstraint3D), a target trajectory is simulated
with a random radius, and gradient descent on the nearest-time trajectory MSE
recovers the radius. Supports the reference's ablations (`use_toc_diff`,
`detach_2nd_bounce`, gravity/friction on/off, GD/Adam) plus a TPU-native
extension the reference runs as 50 separate processes (generate_sphere.sh):
`n_par > 1` vmaps the whole optimization over a seed batch in one SPMD
program (shardable over a device mesh).

Run: python -m diffsdfsim_tpu.experiments.optim_sphere with seed=0 lr=0.1
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..config import SimConfig, default_dtype
from ..physics import (
    BoxShape,
    SphereShape,
    TotalConstraint3D,
    Gravity3D,
    make_body,
    make_world,
    rollout,
)
from ..utils.meshes import chamfer_distance
from .common import Run, parse_cli
from .losses import trajectory_loss

DEFAULTS = dict(
    seed=0,
    run_time=1.5,
    max_iter=100,
    lr=1e-1,
    conv_thresh=1e-5,
    optimizer="GD",
    min_dim=0.4,
    max_dim=2.0,
    use_toc_diff=True,
    detach_2nd_bounce=True,
    use_wall=True,
    use_floor=True,
    use_gravity=True,
    use_friction=True,
    n_par=1,
    sweep_mode="hostloop",  # hostloop | scan (scan: whole GD loop on device)
    sweep_backend="bnative",  # bnative (explicit batch axis) | vmap
    mesh_subdiv=2,
    fric_dirs=8,
    # ablation knobs (VERDICT r4 #2: bisect the r3 semantic changes):
    # contact polish trips, staged-ladder stage-1 depth (-1 = unstaged),
    # replay mode ("emit" | "inline")
    polish_iters=10,
    stage1=2,
    replay="auto",
    # solver backend ablation (VERDICT r4 #4: pallas/xla f32 gap)
    backend="auto",
    base_dir="outputs",
)


def build_cfg(c) -> SimConfig:
    f32 = not jax.config.read("jax_enable_x64")
    return SimConfig(
        fric_dirs=c["fric_dirs"],
        max_contacts_per_pair=4,
        max_contacts_total=8,
        mesh_subdiv=c["mesh_subdiv"],
        # reference bounds: the substep loop is unbounded (world.py:129-133)
        # and the strict halving loop never gives up (world.py:345-349);
        # 6 substeps / 12 halvings cover the deepest observed impact frames
        # (halving histograms in the rad-sweep parity runs top out at k=8)
        max_substeps=6,
        max_bisect=12,
        tol=1e-5 if f32 else 1e-8,
        time_of_contact_diff=c["use_toc_diff"],
        # seed-batched sweeps vmap the rollout: the rung-0 cond would pay
        # both branches per lane there; use the whole-batch custom_vmap gate
        # instead (forces here are plain Gravity — no per-lane tracers)
        ladder_fast_path=c.get("n_par", 1) <= 1,
        ladder_batch_gate=c.get("n_par", 1) > 1,
        contact_polish_iters=c.get("polish_iters", 10),
        ladder_stage1=c.get("stage1", 2),
        replay_mode=c.get("replay", "auto"),
        solver_backend=c.get("backend", "auto"),
    )


def build_world(rad, c, cfg):
    """Build the world (floor + wall + sphere, reference
    optim_sphere.py:78-111); returns (spec, state, sphere_idx, sphere)."""
    dtype = default_dtype()
    fric = 0.25 if c["use_friction"] else 0.0
    rest = 0.5
    bodies, poses, joints, forces, no_contact = [], [], [], [], []
    if c["use_floor"]:
        floor = make_body(
            BoxShape(jnp.array([20.0, 1.0, 20.0], dtype=dtype)),
            restitution=rest, fric_coeff=fric, subdiv=3,
        )
        bodies.append(floor)
        poses.append([1.0, 0, 0, 0, 0.0, -0.5, 0.0])
        joints.append(TotalConstraint3D(body1=len(bodies) - 1))
        forces.append(())
    if c["use_wall"]:
        wall = make_body(
            BoxShape(jnp.array([1.0, 10.0, 10.0], dtype=dtype)),
            restitution=rest, fric_coeff=fric, subdiv=3,
        )
        bodies.append(wall)
        poses.append([1.0, 0, 0, 0, 5.0, 5.0, 0.0])
        joints.append(TotalConstraint3D(body1=len(bodies) - 1))
        forces.append(())
        if c["use_floor"]:
            no_contact.append((0, 1))

    sphere = make_body(
        SphereShape(rad), restitution=rest, fric_coeff=fric, subdiv=c["mesh_subdiv"]
    )
    bodies.append(sphere)
    sphere_idx = len(bodies) - 1
    poses.append([1.0, 0, 0, 0, 0.0, 5.0, 0.0])
    forces.append((Gravity3D(10.0),) if c["use_gravity"] else ())

    vels = jnp.zeros((len(bodies), 6), dtype=dtype).at[sphere_idx, 3].set(5.0)
    spec, state = make_world(
        bodies, jnp.asarray(poses, dtype=dtype), vels,
        joints=joints, forces=forces, no_contact=no_contact, cfg=cfg,
    )
    return spec, state, sphere_idx, sphere


def simulate(rad, c, cfg):
    """Build the world and roll out; returns (final_state, trajectory,
    sphere_body_index, sphere_body)."""
    spec, state, sphere_idx, sphere = build_world(rad, c, cfg)
    n_frames = int(round(c["run_time"] / cfg.dt))
    final, traj = rollout(
        spec, state, n_frames=n_frames, detach_2nd_bounce=c["detach_2nd_bounce"]
    )
    return final, traj, sphere_idx, sphere


def sphere_index(c) -> int:
    return int(c["use_floor"]) + int(c["use_wall"])


def make_loss(c, cfg):
    idx = sphere_index(c)

    def target_traj(target_rad):
        # the reference target world runs WITHOUT detach_2nd_bounce
        # (run_world_fixed_dt default, optim_sphere.py:163/249) — detach is
        # a pure gradient-tape operation so values match either way, but
        # skipping it avoids the re-run frame in vmapped sweeps
        ct = dict(c, detach_2nd_bounce=False)
        _, traj, _, _ = simulate(target_rad, ct, cfg)
        return jax.lax.stop_gradient(traj)

    def loss_fn(rad, tgt_traj):
        _, traj, _, _ = simulate(rad, c, cfg)
        return trajectory_loss(traj, tgt_traj, body=idx)

    return target_traj, loss_fn


def make_loss_batched(c, cfg):
    """Batched-native sweep loss (physics/batched.py): the seed batch is an
    explicit leading axis, so substeps and ladder rungs are whole-batch
    gated instead of vmap's run-both-branches. Returns
    (target_trajs(rads_b) -> lanes-first Trajectory,
     losses(rads_b, tgt) -> (B,) per-lane losses)."""
    from ..physics import make_world_batched, rollout_batched
    from ..physics.batched import trajectory_lanes_first

    idx = sphere_index(c)
    n_frames = int(round(c["run_time"] / cfg.dt))

    def world_fn(rad):
        spec, state, _, _ = build_world(rad, c, cfg)
        return spec, state

    def target_trajs(target_rads):
        # the reference target world runs WITHOUT detach (see make_loss)
        spec, bodies_b, state_b = make_world_batched(world_fn, target_rads)
        _, traj = rollout_batched(
            spec, bodies_b, state_b, n_frames, detach_2nd_bounce=False
        )
        return jax.lax.stop_gradient(trajectory_lanes_first(traj))

    def losses(rads, tgt_lanes):
        spec, bodies_b, state_b = make_world_batched(world_fn, rads)
        _, traj = rollout_batched(
            spec, bodies_b, state_b, n_frames,
            detach_2nd_bounce=c["detach_2nd_bounce"],
        )
        lanes = trajectory_lanes_first(traj)
        return jax.vmap(lambda tr, tg: trajectory_loss(tr, tg, body=idx))(
            lanes, tgt_lanes
        )

    return target_trajs, losses


def sample_params(key, c):
    kt, ks = jax.random.split(key)
    lo, hi = c["min_dim"], c["max_dim"]
    target_rad = jax.random.uniform(kt, (), minval=lo, maxval=hi, dtype=default_dtype())
    start_rad = jax.random.uniform(ks, (), minval=lo, maxval=hi, dtype=default_dtype())
    return target_rad, start_rad


def run_one(key, c, cfg):
    """One seed, fully on-device (lax.scan over GD steps)."""
    target_rad, start_rad = sample_params(key, c)
    lo, hi = c["min_dim"], c["max_dim"]

    target_traj_fn, loss_fn = make_loss(c, cfg)
    tgt_traj = target_traj_fn(target_rad)

    if c["optimizer"] == "Adam":
        opt = optax.adam(c["lr"])
    else:
        opt = optax.sgd(c["lr"])

    vg = jax.value_and_grad(loss_fn)

    # the reference BREAKS when the loss plateaus (|last - loss| <
    # conv_thresh, optim_sphere.py:272-276) BEFORE applying the step. This
    # is load-bearing for the no-TOC ablations: without the TOC differential
    # the loss is a discretization staircase and continued GD on its noisy
    # gradients walks away from the optimum after reaching it. Static-shape
    # equivalent: a done flag freezes (rad, opt_state) once converged.
    thresh = c["conv_thresh"]

    def step(carry, _):
        rad, opt_state, last, done = carry
        val, g = vg(rad, tgt_traj)
        done = done | (jnp.abs(last - val) < thresh)
        upd, new_opt_state = opt.update(g, opt_state)
        new_rad = jnp.clip(rad + upd, lo, hi)
        rad = jnp.where(done, rad, new_rad)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), opt_state, new_opt_state
        )
        return (rad, opt_state, val, done), (val, rad)

    big = jnp.asarray(1e10, dtype=start_rad.dtype)
    (rad_f, _, _, _), (loss_hist, rad_hist) = jax.lax.scan(
        step,
        (start_rad, opt.init(start_rad), big, jnp.asarray(False)),
        None,
        length=c["max_iter"],
    )
    return dict(
        start_rad=start_rad,
        final_rad=rad_f,
        target_rad=target_rad,
        loss_hist=loss_hist,
        rad_hist=rad_hist,
    )


def run_sweep_hostloop(keys, c, cfg):
    """Multi-seed sweep with the GD loop on host: one jitted batched
    value_and_grad per iteration (small compiled graph; preferred on TPU
    where a scan-over-optimizer graph is unnecessarily large).

    Uses the batched-native rollout (physics/batched.py) by default; set
    sweep_backend=vmap for the per-lane vmap path (needed if the world's
    joints/forces ever close over per-lane parameters — not the case
    here)."""
    target_rad, start_rad = jax.vmap(lambda k: sample_params(k, c))(keys)
    lo, hi = c["min_dim"], c["max_dim"]
    bnative = c.get("sweep_backend", "bnative") == "bnative"

    opt = optax.adam(c["lr"]) if c["optimizer"] == "Adam" else optax.sgd(c["lr"])
    thresh = c["conv_thresh"]

    if bnative:
        target_traj_fn, losses = make_loss_batched(c, cfg)
        tgt_traj = jax.jit(target_traj_fn)(target_rad)

        @jax.jit
        def gd_step(rad, opt_state, last, done):
            def f(r):
                l = losses(r, tgt_traj)
                return jnp.sum(l), l

            (_, val), g = jax.value_and_grad(f, has_aux=True)(rad)
            done = done | (jnp.abs(last - val) < thresh)
            upd, new_opt_state = opt.update(g, opt_state)
            new_rad = jnp.clip(rad + upd, lo, hi)
            rad = jnp.where(done, rad, new_rad)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), opt_state, new_opt_state
            )
            return rad, opt_state, val, done

    else:
        target_traj_fn, loss_fn = make_loss(c, cfg)
        tgt_traj = jax.jit(jax.vmap(target_traj_fn))(target_rad)

        @jax.jit
        def gd_step(rad, opt_state, last, done):
            val, g = jax.vmap(jax.value_and_grad(loss_fn))(rad, tgt_traj)
            # per-lane convergence freeze (reference early-stop semantics,
            # optim_sphere.py:272-276 — see run_one)
            done = done | (jnp.abs(last - val) < thresh)
            upd, new_opt_state = opt.update(g, opt_state)
            new_rad = jnp.clip(rad + upd, lo, hi)
            rad = jnp.where(done, rad, new_rad)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), opt_state, new_opt_state
            )
            return rad, opt_state, val, done

    rad = start_rad
    opt_state = opt.init(rad)
    last = jnp.full_like(rad, 1e10)
    done = jnp.zeros(rad.shape, dtype=bool)
    loss_hist, rad_hist = [], []
    for _ in range(c["max_iter"]):
        rad, opt_state, last, done = gd_step(rad, opt_state, last, done)
        loss_hist.append(last)
        rad_hist.append(rad)
        if bool(jnp.all(done)):
            # replicate history to fixed length for the caller
            loss_hist += [loss_hist[-1]] * (c["max_iter"] - len(loss_hist))
            rad_hist += [rad_hist[-1]] * (c["max_iter"] - len(rad_hist))
            break
    return dict(
        start_rad=start_rad,
        final_rad=rad,
        target_rad=target_rad,
        loss_hist=jnp.stack(loss_hist),
        rad_hist=jnp.stack(rad_hist),
    )


def main(argv=None):
    c = parse_cli(DEFAULTS, argv)
    cfg = build_cfg(c)
    run = Run("trajectory_fitting_sphere", c, base_dir=c["base_dir"])

    keys = jax.random.split(jax.random.PRNGKey(c["seed"]), max(c["n_par"], 1))
    fn = functools.partial(run_one, c=c, cfg=cfg)
    if c["n_par"] > 1 and c["sweep_mode"] == "hostloop":
        out = run_sweep_hostloop(keys, c, cfg)
    elif c["n_par"] > 1:
        out = jax.jit(jax.vmap(fn))(keys)
    else:
        out = jax.jit(fn)(keys[0])

    out = jax.tree_util.tree_map(lambda x: jax.device_get(x), out)
    err = abs(out["final_rad"] - out["target_rad"])
    for i, v in enumerate(jnp.atleast_1d(jnp.asarray(out["loss_hist"])).reshape(c["max_iter"], -1).mean(axis=-1)):
        run.log_scalar("loss", float(v), i)
    run.save_output(out)
    run.finish()
    print("radius error:", err)
    return out


if __name__ == "__main__":
    main()
