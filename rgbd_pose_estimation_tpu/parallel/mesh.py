"""Device meshes and multi-host initialization (SURVEY.md §5.8).

The reference has no communication layer at all (single-process C++); the
TPU-native equivalent is XLA collectives over ICI/DCN under a named
``Mesh`` — never a hand-rolled transport. This module is the single place
that builds meshes, so axis names stay consistent everywhere
(``MeshConfig.host_axis``/``chip_axis``).

Multi-host: ``distributed_init`` wraps ``jax.distributed.initialize`` (one
python process per host, SURVEY.md §3.4); ``check_config_consistency``
psum-compares a config hash across hosts at startup so divergent configs
fail fast instead of deadlocking a collective later (SURVEY.md §5.2).

Platform note: the local PJRT plugin is the experimental "axon" platform —
nothing here hard-codes a platform name; we always take ``jax.devices()``
as-is.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

from rgbd_pose_estimation_tpu.utils.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a ``(host, chip)`` mesh over the available devices.

    With ``hosts*chips_per_host`` smaller than the device count, uses a
    prefix of devices (handy for tests); a 1x1 mesh on one device runs the
    same shard_map code paths unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.hosts * cfg.chips_per_host
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(cfg.hosts, cfg.chips_per_host)
    return Mesh(arr, (cfg.host_axis, cfg.chip_axis))


def distributed_init(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX (no-op when single-process).

    Call once per host process before any backend use; afterwards
    ``jax.devices()`` is the global view and ``make_mesh`` sees all chips.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def config_hash(cfg) -> int:
    """Stable 31-bit hash of a (frozen dataclass) config."""
    return int.from_bytes(
        hashlib.sha256(repr(cfg).encode()).digest()[:4], "big"
    ) & 0x7FFFFFFF


def check_config_consistency(mesh: Mesh, cfg) -> bool:
    """psum-compare the config hash across the mesh; True iff identical.

    Cheap divergence tripwire: a mismatched config would otherwise show up
    as a shape mismatch or a hung collective deep inside a jitted step.
    """
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    h = config_hash(cfg)
    axes = mesh.axis_names

    def body(x):
        # pmax == pmin across the mesh ⇔ every host fed the same hash
        # (avoids int32 overflow a psum-of-hashes would risk).
        return jnp.stack([jax.lax.pmax(x, axes), jax.lax.pmin(x, axes)])

    f = shard_map(body, mesh=mesh, in_specs=P(), out_specs=P())
    mx, mn = np.asarray(f(jnp.asarray(h, jnp.int32)))
    return int(mx) == int(mn) == h
