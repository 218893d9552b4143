"""Shape from inertia: recover primitive dimensions from spin response.

Re-creation of `experiments/inertia_fitting/optim_primitives.py`: a body is
pinned translationally (X+Y+Z constraints, reference :111-113), a random unit
torque impulse is applied for 0.3 s (:101-106), and the loss is the final
angular-velocity error ‖v - v_target‖² (:198). Optimized parameters: box
dims (3), sphere radius (1), or cylinder (rad, height). The inertia tensor is
differentiable through the Mirtich mesh integrals of the projection mesh
(custom_inertia=False default) or the analytic formulas.

Run: python -m diffsdfsim_tpu.experiments.optim_primitives with shape=box
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..config import SimConfig, default_dtype
from ..physics import (
    BoxShape,
    CylinderShape,
    SphereShape,
    XConstraint3D,
    YConstraint3D,
    ZConstraint3D,
    ExternalForce3D,
    make_body,
    make_world,
    rollout,
)
from ..utils.meshes import chamfer_distance
from .common import Run, parse_cli

DEFAULTS = dict(
    seed=0,
    shape="box",  # box | sphere | cylinder
    run_time=0.9,
    impulse_time=0.3,
    max_iter=100,
    lr=1e-2,
    min_dim=0.3,
    max_dim=1.2,
    custom_inertia=False,
    custom_mesh=False,
    mesh_subdiv=2,
    n_par=1,
    base_dir="outputs",
)


def build_cfg(c) -> SimConfig:
    f32 = not jax.config.read("jax_enable_x64")
    return SimConfig(
        fric_dirs=4,
        max_contacts_per_pair=2,
        max_contacts_total=2,
        mesh_subdiv=c["mesh_subdiv"],
        max_substeps=2,
        max_bisect=4,
        tol=1e-5 if f32 else 1e-8,
        time_of_contact_diff=False,  # reference default for this experiment
        # seed-batched sweeps vmap the rollout (see SimConfig.ladder_fast_path)
        ladder_fast_path=c.get("n_par", 1) <= 1,
    )


def _make_shape(name, params):
    if name == "box":
        return BoxShape(params)
    if name == "sphere":
        return SphereShape(params[0])
    if name == "cylinder":
        return CylinderShape(params[0], params[1])
    raise ValueError(name)


def n_params(name):
    return {"box": 3, "sphere": 1, "cylinder": 2}[name]


def simulate(params, torque_axis, c, cfg):
    dtype = default_dtype()
    shape = _make_shape(c["shape"], params)
    body = make_body(shape, custom_inertia=c["custom_inertia"], subdiv=c["mesh_subdiv"])

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
        forces=((TorqueImpulse(torque_axis),),),
        cfg=cfg,
    )
    n_frames = int(round(c["run_time"] / cfg.dt))
    final, _ = rollout(spec, state, n_frames=n_frames)
    return final


def run_one(key, c, cfg):
    dtype = default_dtype()
    kt, ks, ka = jax.random.split(key, 3)
    npar = n_params(c["shape"])
    lo, hi = c["min_dim"], c["max_dim"]
    target_params = jax.random.uniform(kt, (npar,), minval=lo, maxval=hi, dtype=dtype)
    start_params = jax.random.uniform(ks, (npar,), minval=lo, maxval=hi, dtype=dtype)
    axis = jax.random.normal(ka, (3,), dtype=dtype)
    axis = axis / jnp.linalg.norm(axis)

    target_final = simulate(target_params, axis, c, cfg)
    target_v = jax.lax.stop_gradient(target_final.v)

    def loss_fn(params):
        final = simulate(params, axis, c, cfg)
        return jnp.sum((final.v[0] - target_v[0]) ** 2)

    opt = optax.adam(c["lr"])
    vg = jax.value_and_grad(loss_fn)

    def step(carry, _):
        p, s = carry
        val, g = vg(p)
        upd, s = opt.update(g, s)
        p = jnp.clip(p + upd, lo, hi)
        return (p, s), (val, p)

    (p_f, _), (loss_hist, p_hist) = jax.lax.scan(
        step, (start_params, opt.init(start_params)), None, length=c["max_iter"]
    )
    return dict(
        start_params=start_params,
        final_params=p_f,
        target_params=target_params,
        loss_hist=loss_hist,
        param_hist=p_hist,
    )


def main(argv=None):
    c = parse_cli(DEFAULTS, argv)
    cfg = build_cfg(c)
    run = Run("inertia_fitting_primitives", c, base_dir=c["base_dir"])

    keys = jax.random.split(jax.random.PRNGKey(c["seed"]), max(c["n_par"], 1))
    fn = functools.partial(run_one, c=c, cfg=cfg)
    out = jax.jit(jax.vmap(fn))(keys) if c["n_par"] > 1 else jax.jit(fn)(keys[0])
    out = jax.tree_util.tree_map(jax.device_get, out)

    for i, v in enumerate(jnp.asarray(out["loss_hist"]).reshape(c["max_iter"], -1).mean(axis=-1)):
        run.log_scalar("loss", float(v), i)
    run.save_output(out)
    run.finish()
    print("param error:", abs(out["final_params"] - out["target_params"]))
    return out


if __name__ == "__main__":
    main()
