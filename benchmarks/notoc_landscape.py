"""Our side of the no-TOC loss-landscape comparison (VERDICT r2 weak #3).

Prints loss + AD gradient over a radius grid for the gravity/no-TOC
optim_sphere objective on CPU float64 at the reference tolerances, in the
same format as `benchmarks/ref_oracle.py landscape` prints the reference's
own numbers — diff the two to decide whether the 0.12-vs-0.038 sweep gap is
an implementation defect or a property of the objective.

Usage: python benchmarks/notoc_landscape.py [target] [lo] [hi] [step]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.experiments.optim_sphere import DEFAULTS, build_cfg, make_loss


def main():
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
    lo = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    hi = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    step = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05

    c = dict(DEFAULTS, use_toc_diff=False, use_gravity=True)
    cfg = build_cfg(c)
    target_traj_fn, loss_fn = make_loss(c, cfg)
    tgt = jax.jit(target_traj_fn)(jnp.asarray(target))
    vg = jax.jit(jax.value_and_grad(loss_fn))
    print(f"target rad {target}", flush=True)
    for r in np.arange(lo, hi + 1e-9, step):
        val, g = vg(jnp.asarray(float(r)), tgt)
        print(f"rad {r:.3f} loss {float(val):.6f} ad {float(g):+.5f}", flush=True)


if __name__ == "__main__":
    main()
