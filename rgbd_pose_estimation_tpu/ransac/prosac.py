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
    key, num_corr: int, num_hypotheses: int, sample_size: int, prosac: bool = True
) -> jnp.ndarray:
    """Draw ``(K, m)`` distinct correspondence indices for K hypotheses.

    Gumbel-top-m: i.i.d. Gumbel noise per (hypothesis, correspondence),
    indices outside hypothesis k's PROSAC window masked to -inf, ``top_k``
    picks m distinct winners — exact sampling without replacement, uniform
    within each window, in one vectorized op.
    """
    g = -jnp.log(
        -jnp.log(
            jax.random.uniform(
                key, (num_hypotheses, num_corr), minval=1e-7, maxval=1.0 - 1e-7
            )
        )
    )
    if prosac:
        win = jnp.asarray(
            prosac_windows(num_corr, num_hypotheses, sample_size), jnp.int32
        )
        col = jnp.arange(num_corr)[None, :]
        g = jnp.where(col < win[:, None], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx
