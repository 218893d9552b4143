"""IGR shape-space decoder (implicit geometric regularization MLP).

JAX re-implementation of the external IGR `ImplicitNet` that the reference
loads dynamically (`sdf_physics/physics3d/utils.py:286-350`: pyhocon config,
`lin{i}` Linear stack with a skip connection at layer 4 where the input is
re-concatenated and scaled by 1/sqrt(2), Softplus(beta=100) activations, and
geometric initialization). The decoder maps (pts ∈ [-1,1]^3, latent) -> sdf,
matching `decode_igr` (utils.py:330-350) — without the reference's 32³-point
chunking, which is unnecessary on TPU (one batched matmul chain on the MXU).

Includes a converter from the published PyTorch checkpoints (`.pth` with
`model_state_dict` / `latent_codes`, utils.py:310-319) via torch-cpu.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype


class ImplicitNetParams(NamedTuple):
    weights: tuple  # per layer (out, in)
    biases: tuple  # per layer (out,)
    skip_in: tuple  # static layer indices with input re-concatenation
    d_in: int


def softplus_beta(x, beta=100.0):
    """torch.nn.Softplus(beta): (1/beta) log(1 + exp(beta x)), with the
    torch threshold=20 linear-region passthrough for stability."""
    bx = beta * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0))) / beta)


def init_implicit_net(
    key,
    d_in: int,
    dims: Sequence[int] = (128,) * 8,
    skip_in: Sequence[int] = (4,),
    radius_init: float = 1.0,
    dtype=None,
) -> ImplicitNetParams:
    """Geometric initialization (IGR): the net starts as an approximate
    sphere SDF of radius `radius_init`."""
    dtype = dtype or default_dtype()
    dims = [d_in] + list(dims) + [1]
    ws, bs = [], []
    keys = jax.random.split(key, len(dims) - 1)
    for layer in range(len(dims) - 1):
        in_dim = dims[layer]
        out_dim = dims[layer + 1]
        if layer + 1 in skip_in:
            out_dim = dims[layer + 1] - d_in
        if layer == len(dims) - 2:
            # final layer: geometric init toward sphere
            w = jnp.full((out_dim, in_dim), math.sqrt(math.pi) / math.sqrt(in_dim), dtype=dtype)
            b = jnp.full((out_dim,), -radius_init, dtype=dtype)
        else:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = jax.random.normal(keys[layer], (out_dim, in_dim), dtype=dtype) * std
            b = jnp.zeros((out_dim,), dtype=dtype)
        ws.append(w)
        bs.append(b)
    return ImplicitNetParams(tuple(ws), tuple(bs), tuple(skip_in), d_in)


def implicit_net_apply(params: ImplicitNetParams, x: jnp.ndarray) -> jnp.ndarray:
    """(N, d_in) -> (N,) SDF values. Matches IGR ImplicitNet.forward:
    skip layers concatenate the network input and divide by sqrt(2)."""
    inp = x
    n_layers = len(params.weights)
    for i in range(n_layers):
        if i in params.skip_in:
            x = jnp.concatenate([x, inp], axis=-1) / jnp.sqrt(2.0).astype(x.dtype)
        x = x @ params.weights[i].T + params.biases[i]
        if i < n_layers - 1:
            x = softplus_beta(x)
    return x[..., 0]


def make_decoder(params: ImplicitNetParams):
    """decoder(pts (N,3), latent (L,)) -> (N,) (reference decode_igr,
    utils.py:330-350)."""

    def decoder(pts, latent):
        n = pts.shape[0]
        lat = jnp.broadcast_to(latent, (n,) + latent.shape)
        return implicit_net_apply(params, jnp.concatenate([lat, pts], axis=-1))

    return decoder


def _parse_hocon_lite(text: str) -> dict:
    """Minimal HOCON subset parser for IGR `exp.conf` files (see
    IGR_data/train_configs/*.conf): nested `name{...}` blocks, `key = value`
    or `"key" : value` pairs, numbers / booleans / strings / [lists] /
    inline {dicts}, optional commas. Replaces the reference's pyhocon
    dependency (utils.py:294-296)."""
    import re

    s = re.sub(r"//[^\n]*|#[^\n]*", "", text)
    tokens = re.findall(r'"[^"]*"|[{}\[\],=:]|[^\s{}\[\],=:]+', s)

    def atom(tok):
        if tok.startswith('"'):
            return tok[1:-1]
        low = tok.lower()
        if low in ("true", "false"):
            return low == "true"
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            return tok

    def parse_value(i):
        tok = tokens[i]
        if tok == "{":
            return parse_dict(i + 1)
        if tok == "[":
            out = []
            i += 1
            while tokens[i] != "]":
                if tokens[i] == ",":
                    i += 1
                    continue
                v, i = parse_value(i)
                out.append(v)
            return out, i + 1
        return atom(tok), i + 1

    def parse_dict(i):
        out = {}
        while tokens[i] != "}":
            if tokens[i] == ",":
                i += 1
                continue
            key = tokens[i][1:-1] if tokens[i].startswith('"') else tokens[i]
            i += 1
            if tokens[i] in ("=", ":"):
                i += 1
            v, i = parse_value(i)
            out[key] = v
        return out, i + 1

    tokens.append("}")
    out, _ = parse_dict(0)
    return out


def load_igr_experiment(experiment_dir: str, timestamp: str = "latest",
                        checkpoint: str = "latest", dtype=None):
    """Resolve an IGR experiment directory exactly like the reference
    (`sdf_physics/physics3d/utils.py:286-327`): pick the latest timestamp
    dir, parse exp.conf (latent_size, network dims/skip_in/beta), and load
    the ModelParameters/LatentCodes torch checkpoints.

    Returns (ImplicitNetParams, latent_codes, conf_dict)."""
    import os

    if timestamp == "latest":
        timestamps = sorted(os.listdir(experiment_dir))
        if not timestamps:
            raise FileNotFoundError(f"no timestamp dirs in {experiment_dir}")
        timestamp = timestamps[-1]
    conf = _parse_hocon_lite(
        open(os.path.join(experiment_dir, timestamp, "exp.conf")).read()
    )
    skip_in = tuple(conf["network"]["inputs"].get("skip_in", [4]))
    ckpt_dir = os.path.join(experiment_dir, timestamp, "checkpoints")
    params, codes = load_torch_checkpoint(
        os.path.join(ckpt_dir, "ModelParameters", f"{checkpoint}.pth"),
        os.path.join(ckpt_dir, "LatentCodes", f"{checkpoint}.pth"),
        skip_in=skip_in,
        dtype=dtype,
    )
    return params, codes, conf


def load_torch_checkpoint(model_path: str, latent_path: str, skip_in=(4,), dtype=None):
    """Convert published IGR PyTorch checkpoints (utils.py:310-319 layout:
    ModelParameters/*.pth with 'model_state_dict' {lin{i}.weight/bias},
    LatentCodes/*.pth with 'latent_codes') to jax arrays.

    Returns (ImplicitNetParams, latent_codes (n_shapes, L))."""
    import torch  # cpu-only, host-side conversion

    dtype = dtype or default_dtype()
    sd = torch.load(model_path, map_location="cpu")["model_state_dict"]
    # strip DataParallel-ish prefixes
    clean = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        clean[k] = v
    idx = 0
    ws, bs = [], []
    while f"lin{idx}.weight" in clean or f"lin{idx}.weight_g" in clean:
        if f"lin{idx}.weight_g" in clean:
            # weight-norm parametrization: w = g * v / |v|
            g = clean[f"lin{idx}.weight_g"].numpy()
            v = clean[f"lin{idx}.weight_v"].numpy()
            w = g * v / np.linalg.norm(v, axis=1, keepdims=True)
        else:
            w = clean[f"lin{idx}.weight"].numpy()
        b = clean[f"lin{idx}.bias"].numpy()
        ws.append(jnp.asarray(w, dtype=dtype))
        bs.append(jnp.asarray(b, dtype=dtype))
        idx += 1
    d_in = ws[0].shape[1]

    lat_data = torch.load(latent_path, map_location="cpu")["latent_codes"]
    if hasattr(lat_data, "weight"):  # nn.Embedding
        lat = lat_data.weight.detach().numpy()
    elif isinstance(lat_data, dict) and "weight" in lat_data:
        lat = lat_data["weight"].numpy()
    else:
        lat = lat_data.detach().numpy()
    return (
        ImplicitNetParams(tuple(ws), tuple(bs), tuple(skip_in), d_in),
        jnp.asarray(lat, dtype=dtype),
    )
