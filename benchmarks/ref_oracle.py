"""Run the ACTUAL reference implementation (/root/reference) as a behavioral
oracle on CPU, by shimming its missing binary dependencies with pure-Python
stand-ins.

The reference needs `ode` (broadphase), `pyrender`/`trimesh` (rendering),
`pytorch3d` (quaternion ops), `ev_sdf_utils` (CUDA marching cubes +
grid interp), `pyhocon` and `cvxpy` — none of which are installed here. Only
four of those are load-bearing for plain simulation: the broadphase, the
quaternion transforms, grid interpolation, and marching cubes. This module
implements those four faithfully (AABB broadphase like ODE's, textbook
quaternion algebra, trilinear interpolation, and marching tetrahedra reusing
diffsdfsim_tpu.ops.marching on CPU) and MagicMocks the render-only rest.

Purpose: decisive ground-truth comparisons — e.g. the no-TOC loss landscape
(VERDICT r2 weak #3) — against the reference's own forward/backward, not our
re-implementation of it.

Usage:
    python benchmarks/ref_oracle.py landscape  # no-TOC loss landscape
    python benchmarks/ref_oracle.py gd --seed-idx 2  # one reference GD run
"""

from __future__ import annotations

import sys
import types
from unittest.mock import MagicMock

import numpy as np
import torch


# ---------------------------------------------------------------- stubs ---


def _install_stubs(mc_res=33):
    """Install pure-Python stand-ins for the reference's binary deps. Must
    run before any `lcp_physics` / `sdf_physics` import."""

    # --- ode: AABB broadphase (HashSpace.collide calls back on pairs whose
    # axis-aligned bounding boxes overlap, like ODE's near_callback) ---
    class _Geom:
        def __init__(self, half_extents):
            self.half = torch.as_tensor(half_extents, dtype=torch.float64)
            self.pos = torch.zeros(3, dtype=torch.float64)
            self.rot = torch.eye(3, dtype=torch.float64)
            self.no_contact = set()
            self.body = None

        def setPosition(self, pos):
            p = torch.as_tensor(
                [float(x) for x in pos], dtype=torch.float64
            ).reshape(-1)
            self.pos = torch.zeros(3, dtype=torch.float64)
            self.pos[: p.numel()] = p[:3]

        def setQuaternion(self, q):
            w, x, y, z = [float(v) for v in q]
            self.rot = torch.tensor(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                ],
                dtype=torch.float64,
            )

        def aabb_half(self):
            return self.rot.abs() @ self.half

    class GeomSphere(_Geom):
        def __init__(self, space, rad):
            super().__init__([rad, rad, rad])

        def setQuaternion(self, q):  # rotation-invariant
            pass

    class GeomBox(_Geom):
        def __init__(self, space, lengths):
            le = torch.as_tensor(
                [float(x) for x in lengths], dtype=torch.float64
            )
            super().__init__(le / 2.0)

    class HashSpace:
        def __init__(self):
            self.geoms = []

        def add(self, geom):
            self.geoms.append(geom)

        def collide(self, args, callback):
            for i in range(len(self.geoms)):
                for j in range(i + 1, len(self.geoms)):
                    g1, g2 = self.geoms[i], self.geoms[j]
                    h1, h2 = g1.aabb_half(), g2.aabb_half()
                    if bool(torch.all((g1.pos - g2.pos).abs() <= h1 + h2)):
                        callback(args, g1, g2)

    ode = types.ModuleType("ode")
    ode.GeomSphere = GeomSphere
    ode.GeomBox = GeomBox
    ode.HashSpace = HashSpace

    def _collide(g1, g2):  # OdeContactHandler path — unused by SDF worlds
        raise NotImplementedError("oracle stub: ODE narrowphase not available")

    ode.collide = _collide
    sys.modules["ode"] = ode

    # --- pytorch3d.transforms: textbook wxyz quaternion algebra ---
    p3d = types.ModuleType("pytorch3d")
    p3dt = types.ModuleType("pytorch3d.transforms")

    def quaternion_to_matrix(q):
        w, x, y, z = torch.unbind(q, -1)
        two = 2.0
        o = torch.stack(
            [
                1 - two * (y * y + z * z), two * (x * y - z * w), two * (x * z + y * w),
                two * (x * y + z * w), 1 - two * (x * x + z * z), two * (y * z - x * w),
                two * (x * z - y * w), two * (y * z + x * w), 1 - two * (x * x + y * y),
            ],
            -1,
        )
        return o.reshape(q.shape[:-1] + (3, 3))

    def matrix_to_quaternion(M):
        # Shepperd's method: pick the largest of the four squared components
        # (differentiable everywhere — a bare sqrt(0) at identity has NaN
        # grad; only the well-conditioned candidate's grads survive the
        # one-hot selection)
        batch = M.shape[:-2]
        m = M.reshape(-1, 3, 3)
        m00, m11, m22 = m[:, 0, 0], m[:, 1, 1], m[:, 2, 2]
        sq = torch.stack(
            [
                1 + m00 + m11 + m22,
                1 + m00 - m11 - m22,
                1 - m00 + m11 - m22,
                1 - m00 - m11 + m22,
            ],
            dim=-1,
        )  # (B,4) = 4*q_i^2
        big = torch.sqrt(torch.clamp(sq, min=1e-12))  # (B,4) = 2*|q_i|
        d = 2.0 * big  # safe denominators (>= 2e-6)
        a01 = m[:, 2, 1] - m[:, 1, 2]
        a02 = m[:, 0, 2] - m[:, 2, 0]
        a03 = m[:, 1, 0] - m[:, 0, 1]
        s12 = m[:, 1, 0] + m[:, 0, 1]
        s13 = m[:, 0, 2] + m[:, 2, 0]
        s23 = m[:, 2, 1] + m[:, 1, 2]
        cands = torch.stack(
            [
                torch.stack([big[:, 0] / 2, a01 / d[:, 0], a02 / d[:, 0], a03 / d[:, 0]], -1),
                torch.stack([a01 / d[:, 1], big[:, 1] / 2, s12 / d[:, 1], s13 / d[:, 1]], -1),
                torch.stack([a02 / d[:, 2], s12 / d[:, 2], big[:, 2] / 2, s23 / d[:, 2]], -1),
                torch.stack([a03 / d[:, 3], s13 / d[:, 3], s23 / d[:, 3], big[:, 3] / 2], -1),
            ],
            dim=1,
        )  # (B,4cand,4)
        onehot = torch.nn.functional.one_hot(sq.argmax(dim=-1), 4).to(m.dtype)
        q = (cands * onehot.unsqueeze(-1)).sum(dim=1)
        q = q / q.norm(dim=-1, keepdim=True)
        return q.reshape(batch + (4,))

    def quaternion_multiply(a, b):
        aw, ax, ay, az = torch.unbind(a, -1)
        bw, bx, by, bz = torch.unbind(b, -1)
        return torch.stack(
            [
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ],
            -1,
        )

    def quaternion_invert(q):
        return q * q.new_tensor([1.0, -1.0, -1.0, -1.0])

    def quaternion_apply(q, pts):
        shp = torch.broadcast_shapes(q.shape[:-1], pts.shape[:-1])
        q = q.expand(shp + (4,))
        pts = pts.expand(shp + (3,))
        pq = torch.cat([pts.new_zeros(shp + (1,)), pts], dim=-1)
        return quaternion_multiply(quaternion_multiply(q, pq), quaternion_invert(q))[
            ..., 1:
        ]

    def so3_exponential_map(w, eps=1e-4):
        # Taylor-safe at w=0 (torch.norm has NaN grad at 0; masked-branch
        # substitution keeps the exact branch finite where unused)
        theta2 = (w * w).sum(-1, keepdim=True)
        theta = torch.sqrt(theta2.clamp(min=1e-30))
        small = theta < eps
        ts = torch.where(small, torch.ones_like(theta), theta)
        A = torch.where(small, 1 - theta2 / 6, torch.sin(ts) / ts)
        B = torch.where(small, 0.5 - theta2 / 24, (1 - torch.cos(ts)) / ts**2)
        wx, wy, wz = torch.unbind(w, -1)
        zero = torch.zeros_like(wx)
        K = torch.stack(
            [zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], -1
        ).reshape(w.shape[:-1] + (3, 3))
        eye = torch.eye(3, dtype=w.dtype, device=w.device).expand_as(K)
        return eye + A.unsqueeze(-1) * K + B.unsqueeze(-1) * (K @ K)

    def axis_angle_to_matrix(a):
        return so3_exponential_map(a)

    p3dt.quaternion_to_matrix = quaternion_to_matrix
    p3dt.matrix_to_quaternion = matrix_to_quaternion
    p3dt.quaternion_multiply = quaternion_multiply
    p3dt.quaternion_invert = quaternion_invert
    p3dt.quaternion_apply = quaternion_apply
    p3dt.so3_exponential_map = so3_exponential_map
    p3dt.axis_angle_to_matrix = axis_angle_to_matrix
    p3d.transforms = p3dt
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.transforms"] = p3dt
    p3dl = types.ModuleType("pytorch3d.loss")

    def chamfer_distance(a, b):
        d = torch.cdist(a, b)  # (B,N,M)
        return d.min(dim=2)[0].mean() + d.min(dim=1)[0].mean(), None

    p3dl.chamfer_distance = chamfer_distance
    p3d.loss = p3dl
    sys.modules["pytorch3d.loss"] = p3dl

    # --- ev_sdf_utils: trilinear grid interp + marching "cubes" ---
    ev = types.ModuleType("ev_sdf_utils")

    def grid_interp(grid, inds):
        """Trilinear interpolation of `grid` at fractional index coords
        `inds` (N,3). grid (X,Y,Z) -> (N,); grid (C,X,Y,Z) -> (N,C)."""
        scalar = grid.dim() == 3
        g = grid.unsqueeze(0) if scalar else grid
        shp = torch.tensor(g.shape[1:], device=inds.device)
        i0 = inds.floor().long().clamp(min=torch.zeros(3, dtype=torch.long), max=shp - 2)
        f = (inds - i0).clamp(0.0, 1.0)  # (N,3)
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[:, 0] if dx else 1 - f[:, 0])
                        * (f[:, 1] if dy else 1 - f[:, 1])
                        * (f[:, 2] if dz else 1 - f[:, 2])
                    )
                    out = out + w[:, None] * g[
                        :, i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz
                    ].transpose(0, 1)
        return out[:, 0] if scalar else out

    _mt_jit_cache = {}

    def marching_cubes(sdfs, level):
        """verts in index coordinates + faces, via the repo's marching-tets
        op on CPU jax (topology only; the reference wraps this in its own
        MeshSDF autograd Function, so no gradient is needed here).

        The jitted op is memoized at module scope: a fresh jax.jit wrapper
        per call misses the in-process cache and re-pays the full compile on
        EVERY reference world rebuild (~10 s x 100 GD iters)."""
        import jax

        if jax.default_backend() != "cpu":  # pragma: no cover
            raise RuntimeError("oracle must run with jax on CPU")
        from diffsdfsim_tpu.ops.marching import marching_tets

        import jax.numpy as jnp

        if "fn" not in _mt_jit_cache:
            _mt_jit_cache["fn"] = jax.jit(marching_tets)

        g = jnp.asarray(np.asarray(sdfs.detach().cpu(), dtype=np.float64))
        tri, valid = _mt_jit_cache["fn"](g - float(level))
        tri = np.asarray(tri)[np.asarray(valid)]  # (T,3,3) index coords
        verts = torch.as_tensor(
            tri.reshape(-1, 3), dtype=sdfs.dtype, device=sdfs.device
        )
        faces = torch.arange(verts.shape[0], device=sdfs.device).reshape(-1, 3)
        return verts, faces

    ev.grid_interp = grid_interp
    ev.marching_cubes = marching_cubes
    sys.modules["ev_sdf_utils"] = ev

    # --- render/config-only deps: inert mocks ---
    for name in ("pyrender", "trimesh", "pyhocon", "cvxpy", "sacred"):
        sys.modules.setdefault(name, MagicMock())

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/repo")
    import os

    os.environ.setdefault("IGR_PATH", "/root/reference/IGR_data")

    # keep jax off the TPU tunnel before the marching_cubes shim touches it
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    # reference default marching-cubes res is 128 (~100k faces/body): cap it
    # for tractable eager-CPU oracle runs. mc_res=33 gives a few thousand
    # faces, the same order as the rebuild's subdiv-2/3 meshes.
    # Defaults3D pins cuda:0; this image's torch is CPU-only
    from sdf_physics.physics3d import utils as ref_utils

    ref_utils.Defaults3D.DEVICE = torch.device("cpu")

    from sdf_physics.physics3d import bodies as ref_bodies

    orig = ref_bodies.SDF3D.__dict__["_diff_marching_cubes"].__func__

    def capped(sdf_func, res=mc_res):
        return orig(sdf_func, res)

    ref_bodies.SDF3D._diff_marching_cubes = staticmethod(capped)


# ------------------------------------------------------------- scenario ---


def make_sphere_world(rad, use_toc_diff=False, dt=1.0 / 30):
    """The optim_sphere scenario (reference optim_sphere.py:78-111): floor +
    wall (TotalConstraint3D), sphere thrown at vx=5 from (0,5,0)."""
    from sdf_physics.physics3d.bodies import SDFBox, SDFSphere
    from sdf_physics.physics3d.constraints import TotalConstraint3D
    from sdf_physics.physics3d.forces import Gravity3D
    from sdf_physics.physics3d.world import World3D

    rest, fric = 0.5, 0.25
    bodies, joints = [], []
    floor = SDFBox([0, -0.5, 0], [20, 1, 20], restitution=rest, fric_coeff=fric)
    bodies.append(floor)
    joints.append(TotalConstraint3D(floor))
    wall = SDFBox([5, 5, 0], [1, 10, 10], restitution=rest, fric_coeff=fric)
    joints.append(TotalConstraint3D(wall))
    bodies.append(wall)
    wall.add_no_contact(floor)
    sphere = SDFSphere(
        [1.0, 0, 0, 0, 0, 5, 0], rad, vel=[0, 0, 0, 5, 0, 0],
        restitution=rest, fric_coeff=fric,
    )
    sphere.add_force(Gravity3D())
    bodies.append(sphere)
    world = World3D(bodies, joints, time_of_contact_diff=use_toc_diff, dt=dt)
    return world, sphere


def run_fixed_dt(world, run_time, detach_2nd_bounce=True):
    """reference run_world_fixed_dt (optim_sphere.py:162-177)."""
    num_contact_steps = 0
    while world.t < run_time:
        had_contacts = world.step(fixed_dt=True)
        if detach_2nd_bounce and had_contacts:
            num_contact_steps += 1
        if detach_2nd_bounce and had_contacts and num_contact_steps > 1:
            world.undo_step()
            world.v = world.v.detach().clone()
            world.set_v(world.v)
            world.set_p(torch.cat([b.p.detach().clone() for b in world.bodies]))
            num_contact_steps = 0


def trajectory_loss(world, world_target):
    """reference trajectory_loss (optim_sphere.py:114-159): nearest-time
    position MSE over the recorded (variable-length) trajectory."""
    loss = 0.0
    last_j = 0
    for s in world.trajectory:
        min_diff, last_diff, min_s, new_j = 1e100, 1e100, None, 0
        for j, s_t in enumerate(world_target.trajectory[last_j:]):
            diff = abs(s[0] - s_t[0])
            if diff <= min_diff:
                min_diff, min_s, new_j = diff, s_t, last_j + j
            if diff > last_diff:
                break
            last_diff = diff
        loss = loss + ((s[1][-3:] - min_s[1][-3:]) ** 2).sum()
        last_j = new_j
    return loss / len(world.trajectory)


# ------------------------------------------------------------------ CLI ---


def cmd_landscape(args):
    """No-TOC loss landscape + AD gradient over a radius grid, against a
    fixed-target trajectory: the reference's own answer to whether the
    gravity/no-TOC objective has local minima (VERDICT r2 weak #3)."""
    torch.set_default_dtype(torch.float64)
    target_rad = float(args.target)
    wt, _ = make_sphere_world(torch.tensor(target_rad))
    run_fixed_dt(wt, args.run_time)
    print(f"target rad {target_rad}: {len(wt.trajectory)} target records", flush=True)
    for r in np.arange(args.lo, args.hi + 1e-9, args.step):
        rad = torch.tensor(float(r), requires_grad=True)
        w, _ = make_sphere_world(rad)
        run_fixed_dt(w, args.run_time, detach_2nd_bounce=True)
        loss = trajectory_loss(w, wt)
        (g,) = torch.autograd.grad(loss, rad)
        print(f"rad {r:.3f} loss {loss.item():.6f} ad {g.item():+.5f}", flush=True)


def cmd_gd(args):
    """One reference GD run (lr 0.1, conv break 1e-5) from a start radius."""
    torch.set_default_dtype(torch.float64)
    wt, _ = make_sphere_world(torch.tensor(float(args.target)))
    run_fixed_dt(wt, args.run_time)
    rad = torch.tensor(float(args.start), requires_grad=True)
    optim = torch.optim.SGD([rad], lr=0.1)
    last_loss = 1e10
    for e in range(args.iters):
        optim.zero_grad()
        w, _ = make_sphere_world(rad)
        run_fixed_dt(w, args.run_time, detach_2nd_bounce=True)
        loss = trajectory_loss(w, wt)
        loss.backward()
        print(f"it {e} rad {rad.item():.4f} loss {loss.item():.6f} "
              f"grad {rad.grad.item():+.5f}", flush=True)
        if abs(last_loss - loss.item()) < 1e-5:
            break
        optim.step()
        with torch.no_grad():
            rad.clamp_(0.4, 2.0)
        last_loss = loss.item()
    print(f"final rad {rad.item():.4f} err {abs(rad.item() - args.target):.4f}")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["landscape", "gd"])
    ap.add_argument("--target", type=float, default=0.71460847528301)
    ap.add_argument("--start", type=float, default=0.4159601559677626)
    ap.add_argument("--lo", type=float, default=0.40)
    ap.add_argument("--hi", type=float, default=1.00)
    ap.add_argument("--step", type=float, default=0.01)
    ap.add_argument("--run-time", type=float, default=1.5)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--mc-res", type=int, default=33)
    args = ap.parse_args()
    _install_stubs(mc_res=args.mc_res)
    if args.cmd == "landscape":
        cmd_landscape(args)
    else:
        cmd_gd(args)


if __name__ == "__main__":
    main()
