"""Shape from inertia in a learned shape space: recover an IGR latent code
from the spin response to a torque impulse.

Re-creation of `experiments/inertia_fitting/optim_shapespace.py` (reference
:1-250): the latent-decoded body is pinned translationally (X+Y+Z
constraints, reference make_world :87-97), a random unit torque is applied
for the first 0.3 s (:78-85), the world runs for `run_time`, and the loss is
the final generalized-velocity error ``sum((v - v_target)**2)`` plus the L2
latent regularizer ``latent_reg * ||z||**2`` (:198). The target latent is a
random training code; the init is N(mean, 0.1*std) over the codes
(init_mode='normal', :155-162). The chamfer distance between the current and
target decoded surfaces is logged every iteration (:195).

The inertia tensor is differentiable through the Mirtich integrals of the
latent shape's projection mesh (ops/inertia.py), so d(loss)/d(latent) flows
through mass *and* angular inertia — the experiment's entire signal (there
are no contacts: a pinned free-spinning body).

Without an external IGR checkpoint, pass ``model_path``/``latent_path`` to
load real weights; the default geometric-init network keeps the pipeline
runnable end-to-end (see optim_shapespace.py).

Run: python -m diffsdfsim_tpu.experiments.optim_shapespace_inertia with seed=0
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..config import SimConfig, default_dtype
from ..physics import (
    ExternalForce3D,
    XConstraint3D,
    YConstraint3D,
    ZConstraint3D,
    make_body,
    make_world,
    rollout,
)
from ..physics.shapes import LatentShape
from ..utils.meshes import chamfer_distance
from .common import Run, parse_cli
from .optim_shapespace import load_decoder

DEFAULTS = dict(
    seed=0,
    run_time=2.0,  # reference cfg: run_time = 2
    impulse_time=0.3,
    max_iter=200,  # reference cfg: max_iter = 200
    lr=1e-3,
    latent_reg=1e-4,  # reference cfg: latent_reg = 1e-4
    latent_size=2,
    scale=1.0,
    mesh_subdiv=2,
    model_path="",
    latent_path="",
    trained_space=False,
    space_cache="outputs/igr_space4.pkl",
    n_par=1,
    base_dir="outputs",
)


def build_cfg(c) -> SimConfig:
    f32 = not jax.config.read("jax_enable_x64")
    # single pinned body, no contacts: minimal contact buffers
    return SimConfig(
        fric_dirs=4,
        max_contacts_per_pair=1,
        max_contacts_total=1,
        mesh_subdiv=c["mesh_subdiv"],
        max_substeps=2,
        max_bisect=2,
        tol=1e-5 if f32 else 1e-8,
        time_of_contact_diff=False,
        # seed-batched sweeps vmap the rollout (see SimConfig.ladder_fast_path)
        ladder_fast_path=c.get("n_par", 1) <= 1,
    )


def _build_body(latent, decoder, c):
    dtype = default_dtype()
    shape = LatentShape(
        latent=latent, scale_=jnp.asarray(c["scale"], dtype=dtype), decoder=decoder
    )
    return make_body(shape, subdiv=c["mesh_subdiv"], project_iters=16)


def simulate(latent, torque_dir, decoder, c, cfg):
    """Pinned spin response; returns (final_state, body)."""
    dtype = default_dtype()
    body = _build_body(latent, decoder, c)
    impulse_t = c["impulse_time"]

    class TorqueImpulse(ExternalForce3D):
        def __init__(self, axis):
            self.axis = axis

        def force(self, t, bd):
            on = (t < impulse_t).astype(dtype)
            return jnp.concatenate([self.axis * on, jnp.zeros(3, dtype=dtype)])

    spec, state = make_world(
        [body],
        jnp.asarray([[1.0, 0, 0, 0, 0.0, 0.0, 0.0]], dtype=dtype),
        jnp.zeros((1, 6), dtype=dtype),
        joints=(XConstraint3D(body1=0), YConstraint3D(body1=0), ZConstraint3D(body1=0)),
        forces=((TorqueImpulse(torque_dir),),),
        cfg=cfg,
    )
    n_frames = int(round(c["run_time"] / cfg.dt))
    final, _ = rollout(spec, state, n_frames=n_frames)
    return final, body


def run_one(key, decoder, codes, c, cfg):
    dtype = default_dtype()
    kt, ks, ka = jax.random.split(key, 3)
    idx = jax.random.randint(kt, (), 0, codes.shape[0])
    target_latent = codes[idx]
    mean = jnp.mean(codes, axis=0)
    std = jnp.std(codes, axis=0)
    start_latent = mean + 0.1 * std * jax.random.normal(ks, mean.shape, dtype)
    torque_dir = jax.random.normal(ka, (3,), dtype=dtype)
    torque_dir = torque_dir / jnp.linalg.norm(torque_dir)

    target_final, target_body = simulate(target_latent, torque_dir, decoder, c, cfg)
    target_v = jax.lax.stop_gradient(target_final.v)
    target_verts = jax.lax.stop_gradient(target_body.verts)

    def loss_fn(z):
        final, body = simulate(z, torque_dir, decoder, c, cfg)
        loss = jnp.sum((final.v[0] - target_v[0]) ** 2) + c["latent_reg"] * jnp.sum(z**2)
        dist = chamfer_distance(body.verts, target_verts)
        return loss, dist

    opt = optax.adam(c["lr"])
    vg = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, _):
        z, s = carry
        (val, dist), g = vg(z)
        upd, s = opt.update(g, s)
        return (z + upd, s), (val, dist, jnp.linalg.norm(z - target_latent))

    (z_f, _), (loss_hist, dist_hist, err_hist) = jax.lax.scan(
        step, (start_latent, opt.init(start_latent)), None, length=c["max_iter"]
    )
    final_body = _build_body(z_f, decoder, c)
    final_dist = chamfer_distance(final_body.verts, target_verts)
    return dict(
        start_latent=start_latent,
        final_latent=z_f,
        target_latent=target_latent,
        torque_dir=torque_dir,
        loss_hist=loss_hist,
        dist_hist=dist_hist,
        latent_err_hist=err_hist,
        final_chamfer=final_dist,
    )


def main(argv=None):
    c = parse_cli(DEFAULTS, argv)
    cfg = build_cfg(c)
    run = Run("inertia_fitting_shapespace", c, base_dir=c["base_dir"])
    decoder, codes = load_decoder(c)
    keys = jax.random.split(jax.random.PRNGKey(c["seed"]), max(c["n_par"], 1))
    fn = functools.partial(run_one, decoder=decoder, codes=codes, c=c, cfg=cfg)
    out = jax.jit(jax.vmap(fn))(keys) if c["n_par"] > 1 else jax.jit(fn)(keys[0])
    out = jax.tree_util.tree_map(jax.device_get, out)
    n_it = c["max_iter"]
    for name in ("loss_hist", "dist_hist"):
        series = jnp.asarray(out[name]).reshape(n_it, -1).mean(axis=-1)
        for i, v in enumerate(series):
            run.log_scalar(name.replace("_hist", ""), float(v), i)
    run.save_output(out)
    run.finish()
    print(
        "latent err start->final:",
        float(jnp.linalg.norm(jnp.asarray(out["start_latent"]) - jnp.asarray(out["target_latent"]))),
        float(jnp.linalg.norm(jnp.asarray(out["final_latent"]) - jnp.asarray(out["target_latent"]))),
        "final chamfer:", float(jnp.mean(jnp.asarray(out["final_chamfer"]))),
    )
    return out


if __name__ == "__main__":
    main()
