"""Experiment-layer units: CLI parsing, run dirs, losses, evaluation."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.experiments.common import Run, parse_cli
from diffsdfsim_tpu.experiments.evaluate import param_errors, read_runs, summarize
from diffsdfsim_tpu.experiments.losses import trajectory_loss
from diffsdfsim_tpu.experiments.generate_jobs import main as gen_jobs
from diffsdfsim_tpu.physics.world import Trajectory


def test_parse_cli_with_syntax():
    cfg = parse_cli(dict(a=1, b=0.5, c=True, d="x"), ["with", "a=2", "c=false", "d=y"])
    assert cfg == dict(a=2, b=0.5, c=False, d="y")


def test_parse_cli_flags():
    cfg = parse_cli(dict(a=1), ["--a", "7"])
    assert cfg["a"] == 7


def test_parse_cli_unknown_key():
    with pytest.raises(SystemExit):
        parse_cli(dict(a=1), ["zz=3"])


def test_run_dir_artifacts(tmp_path):
    run = Run("exp", dict(x=1), base_dir=str(tmp_path))
    run.log_scalar("loss", 3.0, 0)
    run.log_scalar("loss", 2.0, 1)
    run.save_output({"final_rad": np.asarray(0.5), "target_rad": np.asarray(0.6)})
    d = run.finish()
    assert json.loads((d / "run.json").read_text())["status"] == "COMPLETED"
    assert json.loads((d / "metrics.json").read_text())["loss"]["values"] == [3.0, 2.0]

    runs = read_runs(tmp_path / "exp")
    assert len(runs) == 1
    errs = param_errors(runs, "final_rad", "target_rad")
    np.testing.assert_allclose(errs, [0.1], atol=1e-9)
    stats = summarize(errs, "exp")
    assert stats["n"] == 1


def _traj(times, ys, valid=None):
    n = len(times)
    pos = jnp.zeros((n, 1, 1, 3)).at[:, 0, 0, 1].set(jnp.asarray(ys))
    return Trajectory(
        t=jnp.asarray(times).reshape(n, 1),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1, 1, 1)),
        pos=pos,
        v=jnp.zeros((n, 1, 1, 6)),
        valid=jnp.asarray(valid if valid is not None else [True] * n).reshape(n, 1),
    )


def test_trajectory_loss_nearest_time():
    sim = _traj([0.0, 0.1, 0.2], [1.0, 2.0, 3.0])
    tgt = _traj([0.0, 0.1, 0.2], [1.0, 2.0, 3.0])
    assert float(trajectory_loss(sim, tgt, body=0)) == 0.0
    tgt2 = _traj([0.05, 0.1, 0.2], [1.5, 2.5, 3.5])
    # nearest times: 0.0->0.05, 0.1->0.1, 0.2->0.2 => errors 0.5 each
    np.testing.assert_allclose(float(trajectory_loss(sim, tgt2, body=0)), 0.25, atol=1e-9)


def test_trajectory_loss_masks_invalid():
    sim = _traj([0.0, 0.1, 9.9], [1.0, 2.0, 100.0], valid=[True, True, False])
    tgt = _traj([0.0, 0.1], [1.0, 2.0])
    assert float(trajectory_loss(sim, tgt, body=0)) == 0.0


def test_generate_jobs_spmd():
    lines = gen_jobs(["sphere", "50", "--spmd"])
    assert len(lines) == 4
    assert all("n_par=50" in l for l in lines)


def test_generate_jobs_per_seed():
    lines = gen_jobs(["sysid", "3"])
    assert len(lines) == 9  # 3 variants x 3 seeds
