"""CSR-as-Arrow partition encoding for cogrouped kernels.

A DRONE worker holds its partition's adjacency as in-RAM hash maps
(/root/reference/src/graph/graph.go:103-122). Our equivalent: inside a
``cogroup(...).applyInPandas`` kernel, the partition's edges arrive as
one Arrow batch; these helpers turn that batch into a numpy CSR
(indptr/indices over a local vertex dictionary) so per-superstep
gather/scatter is pure vectorized numpy — no Python per row, no JVM
round trips inside the kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class LocalCSR:
    """Compressed sparse rows over the local vertex dictionary.

    vids:    global vertex ids present in this partition (sorted)
    indptr:  CSR row pointers (len = n_local + 1)
    indices: local dst index per edge, grouped by local src
    """

    __slots__ = ("vids", "indptr", "indices")

    def __init__(self, vids: np.ndarray, indptr: np.ndarray, indices: np.ndarray):
        self.vids = vids
        self.indptr = indptr
        self.indices = indices

    @classmethod
    def from_edges(cls, src: np.ndarray, dst: np.ndarray) -> "LocalCSR":
        vids = np.unique(np.concatenate([src, dst]))
        s = np.searchsorted(vids, src)
        d = np.searchsorted(vids, dst)
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        indptr = np.zeros(len(vids) + 1, dtype=np.int64)
        np.add.at(indptr, s + 1, 1)
        np.cumsum(indptr, out=indptr)
        return cls(vids, indptr, d)

    def local_index(self, vids: np.ndarray) -> np.ndarray:
        """Global vid -> local index (-1 when absent)."""
        pos = np.searchsorted(self.vids, vids)
        pos = np.clip(pos, 0, len(self.vids) - 1)
        ok = self.vids[pos] == vids
        return np.where(ok, pos, -1)

    def scatter_sum(self, values: np.ndarray) -> np.ndarray:
        """Push each local vertex's value along its out-edges; return the
        per-local-vertex sum of received values (one numpy pass)."""
        counts = np.diff(self.indptr)
        per_edge = np.repeat(values, counts)
        return np.bincount(self.indices, weights=per_edge, minlength=len(self.vids))


def csr_from_pandas(edges: pd.DataFrame) -> LocalCSR:
    return LocalCSR.from_edges(
        edges["src"].to_numpy(np.int64), edges["dst"].to_numpy(np.int64)
    )
