"""Inertia tensors from closed triangle meshes (Mirtich volume integrals).

Differentiable re-derivation of the reference's polyhedral mass-property
integrals (`sdf_physics/physics3d/bodies.py:260-395`, after Mirtich 1996 /
the OpenFOAM volInt.c lineage noted there): projection integrals -> face
integrals -> volume integrals -> mass-normalized angular inertia tensor.

Fully vectorized over faces; degenerate (zero-area) faces are masked out so
padded or collapsed triangles contribute nothing (the reference never pads,
we do — projection meshes can collapse triangles on SDF edges).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.spherical import normalize


def _gather_axis(vals, axis_idx):
    """vals (F,3,3coords), axis_idx (F,) -> (F,3verts) coordinate axis_idx."""
    return jnp.take_along_axis(
        vals, axis_idx[:, None, None].repeat(vals.shape[1], axis=1), axis=2
    )[..., 0]


def _projection_integrals(v0, v1):
    """Per-face projection integrals over the 3 directed edges
    (reference comp_projection_integrals, bodies.py:260-303).

    v0, v1: (F, 3verts) coordinates a0/a1 (or b0/b1) per edge."""
    a0, a1 = v0
    b0, b1 = v1
    da = a1 - a0
    db = b1 - b0
    a0_2, a0_3 = a0 * a0, a0**3
    a0_4 = a0_3 * a0
    b0_2, b0_3 = b0 * b0, b0**3
    b0_4 = b0_3 * b0
    a1_2, a1_3 = a1 * a1, a1**3
    b1_2, b1_3 = b1 * b1, b1**3

    C1 = a1 + a0
    Ca = a1 * C1 + a0_2
    Caa = a1 * Ca + a0_3
    Caaa = a1 * Caa + a0_4
    Cb = b1 * (b1 + b0) + b0_2
    Cbb = b1 * Cb + b0_3
    Cbbb = b1 * Cbb + b0_4
    Cab = 3 * a1_2 + 2 * a1 * a0 + a0_2
    Kab = a1_2 + 2 * a1 * a0 + 3 * a0_2
    Caab = a0 * Cab + 4 * a1_3
    Kaab = a1 * Kab + 4 * a0_3
    Cabb = 4 * b1_3 + 3 * b1_2 * b0 + 2 * b1 * b0_2 + b0_3
    Kabb = b1_3 + 2 * b1_2 * b0 + 3 * b1 * b0_2 + 4 * b0_3

    P1 = jnp.sum(db * C1, axis=1) / 2.0
    Pa = jnp.sum(db * Ca, axis=1) / 6.0
    Paa = jnp.sum(db * Caa, axis=1) / 12.0
    Paaa = jnp.sum(db * Caaa, axis=1) / 20.0
    Pb = jnp.sum(da * Cb, axis=1) / -6.0
    Pbb = jnp.sum(da * Cbb, axis=1) / -12.0
    Pbbb = jnp.sum(da * Cbbb, axis=1) / -20.0
    Pab = jnp.sum(db * (b1 * Cab + b0 * Kab), axis=1) / 24.0
    Paab = jnp.sum(db * (b1 * Caab + b0 * Kaab), axis=1) / 60.0
    Pabb = jnp.sum(da * (a1 * Cabb + a0 * Kabb), axis=1) / -60.0

    return P1, Pa, Paa, Paaa, Pb, Pbb, Pbbb, Pab, Paab, Pabb


def volume_integrals(verts, faces):
    """T0 (volume), T1 (∫x), T2 (∫x²), TP (∫xy) per axis
    (reference comp_face_integrals + comp_volume_integrals,
    bodies.py:306-377). Returns (T0, T1[3], T2[3], TP[3])."""
    tri = verts[faces]  # (F,3,3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 1]
    n_raw = jnp.cross(e1, e2)
    area_sq = jnp.sum(n_raw * n_raw, axis=1)
    valid_mask = area_sq > 1e-20
    valid = valid_mask.astype(verts.dtype)
    # degenerate faces are masked out below; give them a harmless dummy
    # normal so no NaN gradients leak through 0 * NaN
    dummy = jnp.zeros_like(n_raw).at[:, 0].set(1.0)
    n_safe = jnp.where(valid_mask[:, None], n_raw, dummy)
    normals = normalize(n_safe)
    w = -jnp.sum(normals * tri[:, 0], axis=1)

    C = jnp.argmax(jnp.abs(normals), axis=1)
    A = (C + 1) % 3
    B = (A + 1) % 3

    tri_roll = verts[faces[:, jnp.array([1, 2, 0])]]
    a0 = _gather_axis(tri, A)
    a1 = _gather_axis(tri_roll, A)
    b0 = _gather_axis(tri, B)
    b1 = _gather_axis(tri_roll, B)

    P1, Pa, Paa, Paaa, Pb, Pbb, Pbbb, Pab, Paab, Pabb = _projection_integrals(
        (a0, a1), (b0, b1)
    )

    F_idx = jnp.arange(faces.shape[0])
    nA = normals[F_idx, A]
    nB = normals[F_idx, B]
    nC = normals[F_idx, C]
    # guard: with zero-area faces nC can be 0; contributions are masked below
    k1 = 1.0 / jnp.where(jnp.abs(nC) > 1e-12, nC, 1.0)
    k2, k3 = k1 * k1, k1 * k1 * k1
    k4 = k3 * k1

    Fa = k1 * Pa
    Fb = k1 * Pb
    Fc = -k2 * (nA * Pa + nB * Pb + w * P1)

    Faa = k1 * Paa
    Fbb = k1 * Pbb
    Fcc = k3 * (
        nA * nA * Paa + 2 * nA * nB * Pab + nB * nB * Pbb
        + w * (2 * (nA * Pa + nB * Pb) + w * P1)
    )

    Faaa = k1 * Paaa
    Fbbb = k1 * Pbbb
    Fccc = -k4 * (
        nA**3 * Paaa + 3 * nA * nA * nB * Paab
        + 3 * nA * nB * nB * Pabb + nB**3 * Pbbb
        + 3 * w * (nA * nA * Paa + 2 * nA * nB * Pab + nB * nB * Pbb)
        + w * w * (3 * (nA * Pa + nB * Pb) + w * P1)
    )

    Faab = k1 * Paab
    Fbbc = -k2 * (nA * Pabb + nB * Pbbb + w * Pbb)
    Fcca = k3 * (
        nA * nA * Paaa + 2 * nA * nB * Paab + nB * nB * Pabb
        + w * (2 * (nA * Paa + nB * Pab) + w * Pa)
    )

    # T0: faces contribute along whichever of A/B/C equals axis 0
    nx = normals[:, 0]
    T0 = jnp.sum(
        valid
        * jnp.where(A == 0, nx * Fa, jnp.where(B == 0, nx * Fb, nx * Fc))
    )

    def onehot(idx):
        return jnp.eye(3, dtype=verts.dtype)[idx]

    ohA, ohB, ohC = onehot(A), onehot(B), onehot(C)
    T1 = jnp.sum(
        valid[:, None] * (ohA * (nA * Faa)[:, None] + ohB * (nB * Fbb)[:, None] + ohC * (nC * Fcc)[:, None]),
        axis=0,
    ) / 2.0
    T2 = jnp.sum(
        valid[:, None] * (ohA * (nA * Faaa)[:, None] + ohB * (nB * Fbbb)[:, None] + ohC * (nC * Fccc)[:, None]),
        axis=0,
    ) / 3.0
    TP = jnp.sum(
        valid[:, None] * (ohA * (nA * Faab)[:, None] + ohB * (nB * Fbbc)[:, None] + ohC * (nC * Fcca)[:, None]),
        axis=0,
    ) / 2.0

    return T0, T1, T2, TP


def ang_inertia_from_mesh(verts, faces, mass):
    """Mass-normalized angular inertia tensor about the local origin
    (reference get_ang_inertia, bodies.py:380-395)."""
    T0, T1, T2, TP = volume_integrals(verts, faces)
    density = mass / T0
    diag = density * (T2[jnp.array([1, 2, 0])] + T2[jnp.array([2, 0, 1])])
    J = jnp.diag(diag)
    J = J.at[0, 1].set(-density * TP[0])
    J = J.at[1, 0].set(-density * TP[0])
    J = J.at[1, 2].set(-density * TP[1])
    J = J.at[2, 1].set(-density * TP[1])
    J = J.at[2, 0].set(-density * TP[2])
    J = J.at[0, 2].set(-density * TP[2])
    return J


def mesh_volume(verts, faces):
    T0, _, _, _ = volume_integrals(verts, faces)
    return T0


# analytic inertias (reference "custom_inertia" paths)
def box_inertia(dims, mass):
    """bodies.py:796-797."""
    d = dims
    return mass * jnp.diag(d[jnp.array([1, 0, 0])] ** 2 + d[jnp.array([2, 2, 1])] ** 2) / 12.0


def sphere_inertia(rad, mass):
    """bodies.py:970-971."""
    return 2.0 / 5.0 * mass * rad**2 * jnp.eye(3, dtype=jnp.result_type(rad))


def cylinder_inertia(rad, height, mass):
    """bodies.py:910-912."""
    lat = (3.0 * rad**2 + height**2) / 12.0
    return mass * jnp.diag(jnp.stack([lat, lat, rad**2 / 2.0]))
