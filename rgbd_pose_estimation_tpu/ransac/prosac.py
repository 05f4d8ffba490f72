"""PROSAC progressive sampling (Chum & Matas 2005), batch-first.

The reference draws one minimal set per loop iteration, growing the sampling
window over quality-sorted correspondences. In the batched TPU engine all K
hypotheses are drawn at once, so the growth schedule becomes a *per-
hypothesis window size* n_k (computed once on the host from the standard
PROSAC growth function and cached), and the draw itself is a Gumbel top-m
over each window — sampling without replacement as one fully vectorized
``top_k``, no host loop, no rejection (SURVEY.md §2.1 "PROSAC sampler").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def prosac_windows(n: int, k: int, m: int) -> tuple:
    """Window size n_t for each of k hypotheses over n sorted matches.

    Standard PROSAC growth function: T_n' ≈ expected number of samples drawn
    entirely from the top n, via the recurrence T_{n+1} = T_n (n+1)/(n+1-m).
    Hypothesis t uses the smallest window whose T'_n exceeds t. Cached per
    (n, k, m); returns a tuple so it is hashable and jit-constant.
    """
    if n <= m:
        return tuple([n] * k)
    t_n = float(k)
    for i in range(m):
        t_n *= (m - i) / (n - i)  # T_m = k * C(m,m)/C(n,m) ... iteratively
    windows = np.empty(k, np.int32)
    n_cur = m
    t_cur = t_n  # T'_{n_cur}
    t_next = t_cur
    for t in range(k):
        while t + 1 > t_next and n_cur < n:
            # growth: T_{n+1} = T_n * (n+1)/(n+1-m)
            t_next = t_next * (n_cur + 1) / (n_cur + 1 - m)
            n_cur += 1
        windows[t] = n_cur
    return tuple(int(x) for x in windows)


def sample_minimal_sets(
    key,
    num_corr: int,
    num_hypotheses: int,
    sample_size: int,
    prosac: bool = True,
    method: str = "shifted",
) -> jnp.ndarray:
    """Draw ``(K, m)`` distinct correspondence indices for K hypotheses.

    ``method="shifted"`` (default, O(K·m²)): classic sequential-shift
    sampling without replacement — draw r_j uniform in [0, w-j) and shift it
    past each previously-drawn index. Exactly uniform over distinct
    m-subsets, and ~100x cheaper than the Gumbel path at production sizes
    (the Gumbel top-k was the single largest cost in the whole RANSAC
    estimator: a (K, N) noise matrix plus a K-row top-k sort).

    ``method="gumbel"`` (O(K·N log N)): i.i.d. Gumbel noise per (hypothesis,
    correspondence), windows masked to -inf, ``top_k`` picks m winners —
    kept as the oracle for the sampler parity test.
    """
    if prosac:
        win = jnp.asarray(
            prosac_windows(num_corr, num_hypotheses, sample_size), jnp.int32
        )
    else:
        win = jnp.full((num_hypotheses,), num_corr, jnp.int32)

    if method == "gumbel":
        g = -jnp.log(
            -jnp.log(
                jax.random.uniform(
                    key, (num_hypotheses, num_corr), minval=1e-7, maxval=1.0 - 1e-7
                )
            )
        )
        col = jnp.arange(num_corr)[None, :]
        g = jnp.where(col < win[:, None], g, -jnp.inf)
        _, idx = jax.lax.top_k(g, sample_size)
        return idx

    u = jax.random.uniform(key, (num_hypotheses, sample_size))
    w = win.astype(u.dtype)[:, None]
    cols = []
    for j in range(sample_size):
        r = jnp.floor(u[:, j] * jnp.maximum(w[:, 0] - j, 1.0)).astype(jnp.int32)
        r = jnp.minimum(r, jnp.maximum(win - j - 1, 0))
        # Shift past previously drawn indices, in ascending order: each
        # previous index ≤ the running value bumps it by one.
        if cols:
            prev = jnp.sort(jnp.stack(cols, axis=-1), axis=-1)
            for jj in range(j):
                r = r + (prev[:, jj] <= r).astype(jnp.int32)
        cols.append(r)
    return jnp.stack(cols, axis=-1)
