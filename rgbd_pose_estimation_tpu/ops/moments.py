"""Gather-free minimal-set moments for RANSAC hypothesis generation.

Round-3 estimator anatomy (BASELINE.md): after the MXU scorer landed, the
dominant stage of the 3d3d estimate became the minimal-set GATHER —
``jnp.take`` of (K, 3) sampled rows runs at ~0.16 G indices/s on the TPU
gather unit (measured, tools/roofline.py), 628 us of the 1.4 ms estimate at
K=32768. This module removes the gather entirely.

Key observation: the Horn/Kabsch hypothesis solver does not need the sampled
POINTS — only their MOMENTS:

    sum_p = Σ_{i∈sample} p_i          (3)
    sum_q = Σ_{i∈sample} q_i          (3)
    sum_o = Σ_{i∈sample} p_i q_iᵀ     (9)   [outer products]

All three are LINEAR in the one-hot selection matrix S (N, K) with
S[n, k] = 1 iff correspondence n is in sample k, because the outer products
o_n = p_n q_nᵀ are per-correspondence features computable ONCE for all K:

    moments(16, K) = featᵀ(16, N) @ S(N, K)     — ONE MXU matmul

The Pallas kernel below builds S on the fly in VMEM per K-tile (3 iota
compares — it never touches HBM) and contracts it against the precomputed
feature rows. The (16, N) @ (N, KT) orientation keeps the MXU streaming on
the long K axis instead of padding a 16-lane output 8x.

Exactness: the MXU consumes bf16 operands, so each f32 feature row is split
hi/lo (two bf16 planes, 16 mantissa bits total); S is exactly representable,
hence ``S @ hi + S @ lo`` reconstructs the moment sums to ~2^-17 relative —
measured pose error vs the exact gather path ~1e-5, the same order as f32
Horn itself (tests/kernels/test_moments.py).

Reference: the reference's RANSAC (SURVEY.md §3.1) gathers each minimal set
serially on the CPU; this one-hot-matmul formulation is the TPU-native
replacement for that load.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Hypothesis tile (lanes of the one-hot / moment blocks). Round-5 tile
# sweep at K=32768 (BASELINE.md): 1024 → 139 µs, 512 → 145, 256 → 148;
# non-divisible K falls back to smaller tiles.
_KT = 1024


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _features(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """(16, N) f32 moment features: [p(3), q(3), p⊗q(9), 1]."""
    N = p.shape[0]
    o = (p[:, :, None] * q[:, None, :]).reshape(N, 9)  # o[a*3+b] = p_a q_b
    ones = jnp.ones((N, 1), p.dtype)
    return jnp.concatenate([p, q, o, ones], axis=-1).T


def _split_hi_lo(x: jnp.ndarray):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _moments_kernel(idx_ref, hi_ref, lo_ref, out_ref, *, m: int, n: int):
    # One-hot selection (N, KT): S[n, j] = 1 iff row n is in sample j.
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, idx_ref.shape[1]), 0)
    sel = iota == idx_ref[0:1, :]
    for j in range(1, m):
        sel = sel | (iota == idx_ref[j : j + 1, :])
    s = sel.astype(jnp.bfloat16)
    out_ref[:, :] = jnp.dot(
        hi_ref[:], s, preferred_element_type=jnp.float32
    ) + jnp.dot(lo_ref[:], s, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("impl",))
def minimal_moments(
    idx: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Per-sample moments for K minimal sets, no gather.

    Args: ``idx`` (K, m) int32 correspondence indices (distinct within a
    row), ``p``/``q`` (N, 3) with N a multiple of 128 and K a multiple of
    256. Returns ``(16, K)`` f32: rows 0-2 Σp, 3-5 Σq, 6-14 Σ p⊗q
    (row-major), 15 the sample count m.

    ``impl``: "auto" (Pallas on TPU, jnp twin elsewhere), "reference", or
    "interpret" (kernel parity tests on CPU).
    """
    if impl == "reference" or (impl == "auto" and not _use_pallas()):
        return minimal_moments_reference(idx, p, q)
    K, m = idx.shape
    N = p.shape[0]
    if N % 128 != 0 or K % 256 != 0:
        # Shapes the kernel's tiling can't serve (e.g. a user config with
        # num_hypotheses=1000) silently take the gather path, which handles
        # any (K, N) — the kernel is an optimization, never load-bearing.
        return minimal_moments_reference(idx, p, q)
    kt = next((t for t in (_KT, 512, 256) if K % t == 0), 256)
    feat = _features(p, q)
    hi, lo = _split_hi_lo(feat)
    kern = functools.partial(_moments_kernel, m=m, n=N)
    out = pl.pallas_call(
        kern,
        grid=(K // kt,),
        in_specs=[
            pl.BlockSpec((m, kt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, kt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # 2 bf16 matmuls (contraction N) + the one-hot build
            flops=2 * 2 * 16 * N * K,
            bytes_accessed=4 * (m * K + 2 * 16 * N + 16 * K),
            transcendentals=0,
        ),
        interpret=impl == "interpret",
    )(idx.T.astype(jnp.int32), hi, lo)
    return out


def minimal_moments_reference(idx, p, q) -> jnp.ndarray:
    """jnp twin of :func:`minimal_moments` (oracle + non-TPU fallback) —
    computes the same (16, K) moments by gathering."""
    pm = jnp.take(p, idx, axis=0)  # (K, m, 3)
    qm = jnp.take(q, idx, axis=0)
    sp = jnp.sum(pm, axis=1)  # (K, 3)
    sq = jnp.sum(qm, axis=1)
    so = jnp.einsum("kma,kmb->kab", pm, qm).reshape(idx.shape[0], 9)
    cnt = jnp.full((idx.shape[0], 1), float(idx.shape[1]), p.dtype)
    return jnp.concatenate([sp, sq, so, cnt], axis=-1).T
