"""Canonical PartitionSpecs for every distributed layout (SURVEY.md §5.8).

One module owns the specs (pattern per SNIPPETS.md [3]) so layouts are
greppable and consistent. The geometry-native parallelism mapping
(SURVEY.md §2.2):

- DP axis   → RANSAC hypotheses / frame pairs / pose-graph edges
- TP axis   → pixels of the dense-ICP grid / columns of the score matrix
- SP        → the video: sequence chunks across hosts
- CP (ring) → keyframe blocks rotated by ppermute for all-pairs similarity
- Ulysses   → all-to-all relayout between odometry (by-frame) and BA
              (by-landmark) phases — expressed as a resharding constraint
"""

from __future__ import annotations

import dataclasses

from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class SpecLayout:
    host: str = "host"
    chip: str = "chip"

    @property
    def all_axes(self):
        return (self.host, self.chip)

    # --- RANSAC (DP over hypotheses) ---
    def hypotheses(self) -> P:
        """K poses sharded over every device; correspondences replicated."""
        return P((self.host, self.chip))

    def correspondences(self) -> P:
        return P()

    # --- dense ICP (TP over pixel rows) ---
    def pixel_rows(self) -> P:
        """(S, 128)-packed pixel data sharded by row block within a host."""
        return P(None, self.chip)

    # --- BA (observations sharded over the whole mesh) ---
    def observations(self) -> P:
        return P((self.host, self.chip))

    def cameras(self) -> P:  # replicated; reduced via psum
        return P()

    def landmarks(self) -> P:  # replicated in v1 (see ba/schur.py notes)
        return P()

    # --- ring association (CP over keyframe blocks) ---
    def keyframe_blocks(self) -> P:
        return P((self.host, self.chip))


DEFAULT = SpecLayout()
