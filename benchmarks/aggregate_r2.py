#!/usr/bin/env python
"""Aggregate round-2 experiment outputs into RESULTS_TPU-style tables."""
import json
import pickle
import sys
from pathlib import Path

import numpy as np


def sweep_tables(base="outputs/sweeps_r2/trajectory_fitting_sphere"):
    rows = {}
    for d in sorted(Path(base).iterdir()):
        cfgf, outf = d / "config.json", d / "output.pkl"
        if not (cfgf.exists() and outf.exists()):
            continue
        cfg = json.loads(cfgf.read_text())
        with open(outf, "rb") as f:
            out = pickle.load(f)
        key = (cfg["use_gravity"], cfg["use_toc_diff"])
        err = np.abs(np.asarray(out["final_rad"]) - np.asarray(out["target_rad"])).ravel()
        rows.setdefault(key, []).append(err)
    for key in sorted(rows):
        err = np.concatenate(rows[key])
        g, t = key
        print(f"gravity={g} toc={t}: n={err.size} min={err.min():.2e} "
              f"mean={err.mean():.4f} max={err.max():.3f}")


def pointcloud_tables(base="outputs/pointcloud_full_r2"):
    rows = {}
    for sub in Path(base).iterdir():
        for d in sorted(sub.iterdir()):
            cfgf, outf = d / "config.json", d / "output.pkl"
            if not (cfgf.exists() and outf.exists()):
                continue
            cfg = json.loads(cfgf.read_text())
            with open(outf, "rb") as f:
                out = pickle.load(f)
            key = (cfg["shape"], cfg["use_gravity"])
            rows.setdefault(key, []).append(out)
    for key in sorted(rows):
        outs = rows[key]
        print(f"\n{key[0]} gravity={key[1]} (n={len(outs)}):")
        for phase in ("init", "frame_fit", "traj_fit"):
            pe = np.mean([o[phase]["pos_err"] for o in outs])
            re = np.mean([o[phase]["rot_err"] for o in outs])
            se = np.mean([o[phase]["size_err"] for o in outs])
            # reference table reports squared pos/rot (so3_relative_angle^2,
            # ||dpos||^2); print both conventions
            pe2 = np.mean([o[phase]["pos_err"] ** 2 for o in outs])
            re2 = np.mean([o[phase]["rot_err"] ** 2 for o in outs])
            print(f"  {phase:9s} pos {pe:.4f} (sq {pe2:.4f})  "
                  f"rot {re:.4f} (sq {re2:.4f})  size {se:.4f}")


def shapespace_table(base="outputs/shapespace_r2/trajectory_fitting_shapespace"):
    errs0, errs1, chams = [], [], []
    for d in sorted(Path(base).iterdir()):
        outf = d / "output.pkl"
        if not outf.exists():
            continue
        with open(outf, "rb") as f:
            out = pickle.load(f)
        s = np.linalg.norm(np.asarray(out["start_latent"]) - np.asarray(out["target_latent"]))
        e = np.linalg.norm(np.asarray(out["final_latent"]) - np.asarray(out["target_latent"]))
        errs0.append(s)
        errs1.append(e)
    if errs0:
        print(f"shapespace: n={len(errs0)} latent err start {np.mean(errs0):.4f} "
              f"-> final {np.mean(errs1):.4f} (max final {np.max(errs1):.4f})")


def inertia_space_table(base="outputs/inertia_space_r2/inertia_fitting_shapespace"):
    rows = []
    for d in sorted(Path(base).iterdir()):
        outf = d / "output.pkl"
        if not outf.exists():
            continue
        with open(outf, "rb") as f:
            out = pickle.load(f)
        s = np.linalg.norm(np.asarray(out["start_latent"]) - np.asarray(out["target_latent"]))
        e = np.linalg.norm(np.asarray(out["final_latent"]) - np.asarray(out["target_latent"]))
        rows.append((s, e, float(np.asarray(out["final_chamfer"]))))
    for s, e, c in rows:
        print(f"inertia-shapespace: latent {s:.4f} -> {e:.4f}, chamfer {c:.5f}")


def sysid_table(base="outputs/sysid_r2"):
    for sub in sorted(Path(base).iterdir()):
        for d in sorted(sub.iterdir()):
            cfgf, outf = d / "config.json", d / "output.pkl"
            if not (cfgf.exists() and outf.exists()):
                continue
            cfg = json.loads(cfgf.read_text())
            with open(outf, "rb") as f:
                out = pickle.load(f)
            err = np.abs(np.asarray(out["final_theta"]) - np.asarray(out["target_theta"])).ravel()
            print(f"sysid {cfg['param']}: n={err.size} mean err {err.mean():.4f} "
                  f"max {err.max():.4f}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["sweep", "pointcloud", "shapespace", "inertia", "sysid"]
    fns = dict(sweep=sweep_tables, pointcloud=pointcloud_tables,
               shapespace=shapespace_table, inertia=inertia_space_table,
               sysid=sysid_table)
    for w in which:
        try:
            fns[w]()
        except Exception as e:
            print(f"[{w}] failed: {e}")
