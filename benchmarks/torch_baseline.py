#!/usr/bin/env python
"""Eager-PyTorch double-precision baseline for the 100-frame bounce workload.

The reference framework (EmbodiedVision/diffsdfsim) cannot run in this image
(its deps pytorch3d / py3ode / ev_sdf_utils are absent), so this is a
faithful eager-torch re-creation of its cost profile for the SAME physical
workload bench.py measures: per-frame Python loop, float64 torch tensors,
Frank-Wolfe SDF contact search over the sphere mesh (reference
contacts.py:39-94 semantics), a torch-autograd interior-point LCP solve per
contact step (reference solver layout: Q=M 12x12, Jc/Jf/E/mu mixed LCP), TOC
identity-with-custom-backward, and loss.backward() through the rollout.

Reported number = steps/sec fwd+bwd, printed as JSON. Run once to calibrate
TORCH_BASELINE_STEPS_PER_SEC in bench.py.
"""

import json
import time

import numpy as np
import torch

torch.set_default_dtype(torch.float64)

G = 10.0
DT = 1.0 / 30.0
E_REST = 0.5
MU = 0.25
N_FRAMES = 100
DROP = 1.2


def icosphere(sub=2):
    t = (1 + 5**0.5) / 2
    v = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0], [0, -1, t], [0, 1, t],
         [0, -1, -t], [0, 1, -t], [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
        dtype=np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11], [1, 5, 9],
         [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
         [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5], [2, 4, 11], [6, 2, 10],
         [8, 6, 7], [9, 8, 1]])
    for _ in range(sub):
        mids = {}
        vl = list(v)
        nf = []
        for a, b, c in f:
            def mid(x, y):
                k = (min(x, y), max(x, y))
                if k not in mids:
                    m = vl[x] + vl[y]
                    m /= np.linalg.norm(m)
                    vl.append(m)
                    mids[k] = len(vl) - 1
                return mids[k]
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.stack(vl)
        f = np.array(nf)
    return torch.tensor(v), torch.tensor(f)


TV, TF = icosphere(2)


def floor_sdf(p):
    # box [20,1,20] centered at (0,-0.5,0): top plane at y=0
    q = torch.abs(p - torch.tensor([0.0, -0.5, 0.0])) - torch.tensor([10.0, 0.5, 10.0])
    m = torch.clamp(q, min=0.0)
    return m.norm(dim=-1) + torch.clamp(q.max(dim=-1).values, max=0.0)


class Toc(torch.autograd.Function):
    @staticmethod
    def forward(ctx, h, c, v, r):
        ctx.save_for_backward(h, c, v, r)
        return h

    @staticmethod
    def backward(ctx, dL):
        h, c, v, r = ctx.saved_tensors
        dD_dh = -v
        if dD_dh < 1e-6 / h:
            dD_dh = torch.zeros(())
        den = dD_dh**2
        w = dD_dh / den if den > 1e-5 else torch.zeros(())
        return dL, w * dL, w * h * dL, -w * dL


def frank_wolfe_contact(y, rad):
    """sphere-mesh verts vs floor SDF: 32 FW iters over all faces."""
    verts = TV * rad + torch.stack([torch.zeros(()), y, torch.zeros(())])
    pqr = verts[TF]
    x = pqr.mean(dim=1)
    for it in range(32):
        sd = floor_sdf(x)
        grads = torch.zeros_like(x)
        grads[:, 1] = 1.0
        d = torch.einsum("fvc,fc->fv", pqr, grads)
        ind = d.argmin(dim=1)
        s = pqr[torch.arange(pqr.shape[0]), ind]
        gamma = 2.0 / (it + 2.0)
        x = (1 - gamma) * x + gamma * s
    sd = floor_sdf(x)
    pen = -(sd.min())
    return pen


def lcp_bounce(v, M, rad):
    """interior-point-style solve via torch (8 iters of a damped KKT)."""
    # variables: new velocity 6-vec of the sphere; one contact row
    n = torch.tensor([0.0, 1.0, 0.0])
    c1 = torch.cat([torch.zeros(0), torch.tensor([0.0, 0.0, 0.0])])
    Jc = torch.cat([torch.cross(torch.tensor([0.0, -1.0, 0.0]) * rad, n), n]).unsqueeze(0)
    dirs = torch.stack(
        [torch.tensor([1.0, 0, 0]), torch.tensor([0.0, 0, 1]),
         -torch.tensor([1.0, 0, 0]), -torch.tensor([0.0, 0, 1])])
    Jf = torch.cat([torch.cross((-rad * n).expand(4, 3), dirs), dirs], dim=1)
    Gm = torch.cat([Jc, Jf, torch.zeros(1, 6)])
    F = torch.zeros(6, 6)
    F[1:5, 5] = 1.0
    F[5, 0] = MU
    F[5, 1:5] = -1.0
    h = torch.cat([(Jc @ v) * E_REST, torch.zeros(5)])
    u = M @ v + DT * torch.tensor([0.0, 0, 0, 0, -G, 0.0])
    # PDIPM-ish: 10 iterations of projected KKT solves
    z = torch.zeros(6)
    lam = torch.ones(6)
    s = torch.ones(6)
    x = -torch.linalg.solve(M, u)
    for _ in range(10):
        d = lam / s
        S = Gm @ torch.linalg.solve(M, Gm.t()) + F + torch.diag(1.0 / d)
        rhs = Gm @ torch.linalg.solve(M, u) + h
        lam = torch.linalg.solve(S, rhs)
        lam = torch.clamp(lam, min=1e-10)
        s = torch.clamp(h - Gm @ x + F @ lam, min=1e-10)
        x = -torch.linalg.solve(M, u + Gm.t() @ lam)
    return x


def rollout(rad):
    y = torch.tensor(DROP)
    v = torch.zeros(6)
    M = torch.eye(6)
    M[:3, :3] *= 2.0 / 5.0 * rad.detach() ** 2
    loss = torch.zeros(())
    contact = False
    for _ in range(N_FRAMES):
        pen = frank_wolfe_contact(y, rad)
        in_contact = bool((y - rad).detach() < 1e-4)
        if in_contact:
            newv = lcp_bounce(v, M, rad)
        else:
            newv = v + DT * torch.tensor([0.0, 0, 0, 0, -G, 0.0])
        h = torch.tensor(DT)
        ytrial = y + h * newv[4]
        k = 0
        while float(ytrial.detach() - rad) < -1e-8 and k < 8:
            h = h / 2
            ytrial = y + h * newv[4]
            k += 1
        new_contact = bool(float(ytrial.detach() - rad) <= 1e-6)
        if new_contact and not contact:
            h = Toc.apply(h, y, newv[4], rad)
            ytrial = y + h * newv[4]
        contact = new_contact
        y = ytrial
        v = newv
        loss = loss + y**2
    return loss


def main():
    rad = torch.tensor(0.5, requires_grad=True)
    # warmup
    loss = rollout(rad)
    loss.backward()
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        rad.grad = None
        loss = rollout(rad)
        loss.backward()
    dt = (time.perf_counter() - t0) / n_rep
    print(json.dumps({"torch_baseline_steps_per_sec": round(N_FRAMES / dt, 2)}))


if __name__ == "__main__":
    main()
