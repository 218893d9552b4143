#!/usr/bin/env python
"""Shape optimization demo: optimize a latent-space shape so the falling
body lands at a target position.

Re-creation of the reference `demos/demo_meshsdf.py`: a fixed floor (SDFBox)
and a fixed cylinder pole (both TotalConstraint3D) plus a falling latent-code
body (IGR decoder); the loss is the final-position target plus an L2 latent
regularizer (reference :88), optimized with SGD (lr 5e-3, grad-norm clip 10,
reference :58-92). Without the external IGR checkpoint a geometric-init
network is used; pass --model_path/--latent_path for real weights.

Run: python demos/demo_meshsdf.py [iters=N]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from diffsdfsim_tpu.config import SimConfig, default_dtype
from diffsdfsim_tpu.experiments.common import parse_cli
from diffsdfsim_tpu.models.igr import init_implicit_net, load_torch_checkpoint, make_decoder
from diffsdfsim_tpu.physics import (
    BoxShape,
    CylinderShape,
    TotalConstraint3D,
    Gravity3D,
    make_body,
    make_world,
    rollout,
)
from diffsdfsim_tpu.physics.shapes import LatentShape

DEFAULTS = dict(
    iters=50,
    lr=5e-3,
    latent_reg=1e-2,
    latent_size=2,
    run_time=1.0,
    grad_clip=10.0,
    model_path="",
    latent_path="",
    out="demo_meshsdf_out.pkl",
)


def main(argv=None):
    c = parse_cli(DEFAULTS, argv)
    dtype = default_dtype()
    f32 = not jax.config.read("jax_enable_x64")
    cfg = SimConfig(
        fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
        mesh_subdiv=2, max_substeps=3, max_bisect=6,
        tol=1e-5 if f32 else 1e-8,
    )

    if c["model_path"]:
        params, codes = load_torch_checkpoint(c["model_path"], c["latent_path"])
        decoder = make_decoder(params)
        z0 = codes[0]
    else:
        params = init_implicit_net(
            jax.random.PRNGKey(7), d_in=3 + c["latent_size"], radius_init=0.5
        )
        decoder = make_decoder(params)
        z0 = jnp.zeros(c["latent_size"], dtype=dtype)

    target_pos = jnp.asarray([0.8, 0.5, 0.0], dtype=dtype)
    n_frames = int(round(c["run_time"] / cfg.dt))

    def loss_fn(z):
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0], dtype=dtype)), subdiv=3)
        pole = make_body(CylinderShape(jnp.asarray(0.15, dtype=dtype), jnp.asarray(1.2, dtype=dtype)), subdiv=2)
        shape = LatentShape(latent=z, scale_=jnp.asarray(0.6, dtype=dtype), decoder=decoder)
        body = make_body(shape, subdiv=2, project_iters=16)
        poses = jnp.asarray(
            [
                [1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                # pole axis is local z; rotate to stand upright (x axis 90deg)
                [0.7071067811865476, 0.7071067811865476, 0, 0, 0.3, 0.6, 0.0],
                [1.0, 0, 0, 0, 0.0, 2.2, 0.0],
            ],
            dtype=dtype,
        )
        vels = jnp.zeros((3, 6), dtype=dtype)
        spec, state = make_world(
            [floor, pole, body], poses, vels,
            joints=(TotalConstraint3D(body1=0), TotalConstraint3D(body1=1)),
            forces=((), (), (Gravity3D(10.0),)),
            no_contact=[(0, 1)],
            cfg=cfg,
        )
        final, _ = rollout(spec, state, n_frames=n_frames)
        return jnp.sum((final.pos[2] - target_pos) ** 2) + c["latent_reg"] * jnp.sum(z**2)

    opt = optax.chain(optax.clip_by_global_norm(c["grad_clip"]), optax.sgd(c["lr"]))
    vg = jax.jit(jax.value_and_grad(loss_fn))
    z = z0
    opt_state = opt.init(z)
    hist = {"loss": [], "latent": []}
    for i in range(c["iters"]):
        val, g = vg(z)
        upd, opt_state = opt.update(g, opt_state)
        z = z + upd
        hist["loss"].append(float(val))
        hist["latent"].append(jax.device_get(z))
        print(f"iter {i}: loss {float(val):.5f}")

    with open(c["out"], "wb") as f:
        pickle.dump(hist, f)
    print("saved", c["out"])


if __name__ == "__main__":
    main()
