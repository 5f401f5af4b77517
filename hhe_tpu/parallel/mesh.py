"""Device-mesh sharding of ciphertext batches and RNS limbs.

The reference has no data-center parallelism (SURVEY §2.4): its only
parallel axes are SIMD slot packing and a sequential per-record loop
(``CSP.cpp:247-252``).  Here those become first-class mesh axes:

- ``batch``: ciphertext/sample batch — pure data parallel; transcipher and
  encrypted inference fan out across chips with no communication (the
  reference's per-record loop, parallelized).
- ``limb``: RNS limbs — model-parallel-style sharding of the modulus chain;
  NTTs and pointwise limb algebra are limb-local, key-switch inner products
  reduce across limbs via XLA collectives.

Multi-host: call ``init_distributed()`` (jax.distributed) before building the
mesh; batch shards then ride DCN across hosts while limb shards stay on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bfv


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (no-op for single-process runs)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_hhe_mesh(
    n_devices: Optional[int] = None, limb_shards: int = 1
) -> Mesh:
    """Mesh with ("batch", "limb") axes over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % limb_shards == 0, (n, limb_shards)
    return jax.make_mesh(
        (n // limb_shards, limb_shards),
        ("batch", "limb"),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
        devices=devs[:n],
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched ciphertext tensors [size, B, k, N]."""
    return NamedSharding(mesh, P(None, "batch", "limb", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ciphertext_batch(ct: bfv.Ciphertext, mesh: Mesh) -> bfv.Ciphertext:
    """Place a batched ciphertext [size, B, k, N] onto the mesh: samples over
    `batch`, RNS limbs over `limb` (only if k divides evenly; otherwise limbs
    stay replicated)."""
    data = jnp.asarray(ct.data)
    assert data.ndim == 4, "expected batched ciphertext [size, B, k, N]"
    k = data.shape[2]
    limb_ax = "limb" if k % mesh.shape["limb"] == 0 else None
    sh = NamedSharding(mesh, P(None, "batch", limb_ax, None))
    return bfv.Ciphertext(jax.device_put(data, sh))


def pad_batch(arr: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad a sample batch so it divides the mesh batch axis; returns
    (padded, original_len)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(arr, pad_widths, mode="edge"), n
