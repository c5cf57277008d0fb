"""Device mesh construction (SURVEY.md §2.3: the TPU build's distribution
axes are ``dp`` — data parallel over graphs — and ``edge`` — edge-partitioned
execution of one large graph; the reference has no distribution at all,
train.py:81-83)."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def parse_mesh_shape(spec: str) -> dict[str, int]:
    """Parse "dp=2,edge=4" -> {"dp": 2, "edge": 4}."""
    out: dict[str, int] = {}
    if not spec:
        return out
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def make_mesh(shape: dict[str, int] | str | None = None,
              devices=None) -> Mesh:
    """Build a Mesh. Default: all devices on one ``edge`` axis."""
    if isinstance(shape, str):
        shape = parse_mesh_shape(shape)
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"edge": len(devices)}
    sizes = list(shape.values())
    assert int(np.prod(sizes)) <= len(devices), (shape, len(devices))
    devs = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(devs, tuple(shape.keys()))
