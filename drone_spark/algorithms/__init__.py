"""Graph algorithm kernels: PageRank, connected components, label
propagation, triangle count (+ SSSP for reference parity)."""

from .pagerank import pagerank  # noqa: F401
