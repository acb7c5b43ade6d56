"""Pure-Python/NumPy reference implementations (FIXTURES.md F4).

Built from scratch because the reference ships no automated tests
(SURVEY.md §5); semantics pinned to the reference's kernels where they
exist (PageRank.go, CC.go, SSSP.go)."""

from __future__ import annotations

from itertools import combinations

import numpy as np


def numpy_pagerank(edges: list[tuple[int, int]], tol=1e-6, damping=0.85, max_iter=2000):
    """Unnormalized fixpoint pr = d·Σ_in pr_u/outdeg_u + (1-d), init 1.0
    (PageRank.go:11,19,74)."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    src = np.array([idx[s] for s, _ in edges])
    dst = np.array([idx[d] for _, d in edges])
    pr = np.ones(n)
    for _ in range(max_iter):
        w = np.divide(pr, outdeg, out=np.zeros(n), where=outdeg > 0)
        acc = np.zeros(n)
        np.add.at(acc, dst, w[src])
        new = (1 - damping) + damping * acc
        done = np.max(np.abs(new - pr)) <= tol
        pr = new
        if done:
            break
    return {v: pr[idx[v]] for v in ids}


def union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Min-vid label per undirected component (CC.go:51-54 semantics)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def component_min_label(edges, labels: dict[int, int]) -> dict[int, int]:
    """Per-vertex minimum of ``labels`` over its component (hash-to-min)."""
    comp = union_find_components(edges)
    best: dict[int, int] = {}
    for v, c in comp.items():
        best[c] = min(best.get(c, labels[v]), labels[v])
    return {v: best[c] for v, c in comp.items()}


def brute_triangles(edges: list[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for v, nbrs in adj.items():
        for a, b in combinations(sorted(n for n in nbrs if n > v), 2):
            if b in adj[a]:
                count += 1
    return count


def bfs_distances(edges: list[tuple[int, int]], source: int) -> dict[int, float]:
    """Directed unit-weight shortest paths (reference forces weight 1.0,
    graph.go:357-362)."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist = {source: 0.0}
    frontier = [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1.0
                    nxt.append(v)
        frontier = nxt
    return dist


def numpy_ppr(
    edges: list[tuple[int, int]],
    seeds: list[int],
    tol=1e-9,
    damping=0.85,
    max_iter=5000,
):
    """Personalized PageRank, Σpr-=-1 convention: pr0 = 1/|S| on seeds,
    fixpoint pr = d·Σ_in pr_u/outdeg_u + (1-d)/|S|·[v ∈ S]; dangling
    mass leaks (no redistribution), matching the engine's uniform-PR
    convention."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    src = np.array([idx[s] for s, _ in edges])
    dst = np.array([idx[d] for _, d in edges])
    sset = {s for s in seeds if s in idx}
    base = np.zeros(n)
    pr = np.zeros(n)
    for s in sset:
        base[idx[s]] = (1 - damping) / len(seeds)
        pr[idx[s]] = 1.0 / len(seeds)
    for _ in range(max_iter):
        w = np.divide(pr, outdeg, out=np.zeros(n), where=outdeg > 0)
        acc = np.zeros(n)
        np.add.at(acc, dst, w[src])
        new = base + damping * acc
        done = np.max(np.abs(new - pr)) <= tol
        pr = new
        if done:
            break
    return {v: pr[idx[v]] for v in ids}


def numpy_weighted_pagerank(
    edges: list[tuple[int, int, float]],
    tol=1e-6,
    damping=0.85,
    max_iter=2000,
):
    """Weighted PageRank: scatter pr·w_e/W_u (W_u = Σ out-weights);
    fixpoint pr = d·Σ_in pr_u·w_e/W_u + (1-d), init 1.0."""
    ids = sorted({v for s, d, _ in edges for v in (s, d)})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outw = np.zeros(n)
    for s, _, w in edges:
        outw[idx[s]] += w
    src = np.array([idx[s] for s, _, _ in edges])
    dst = np.array([idx[d] for _, d, _ in edges])
    ws = np.array([w for _, _, w in edges], dtype=float)
    pr = np.ones(n)
    for _ in range(max_iter):
        r = np.divide(pr, outw, out=np.zeros(n), where=outw > 0)
        acc = np.zeros(n)
        np.add.at(acc, dst, r[src] * ws)
        new = (1 - damping) + damping * acc
        done = np.max(np.abs(new - pr)) <= tol
        pr = new
        if done:
            break
    return {v: pr[idx[v]] for v in ids}


def py_kcore(edges: list[tuple[int, int]], k: int):
    """Parallel peeling to fixpoint; returns {vid: core_degree} of the
    k-core (undirected, simple, self-loops dropped)."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    active = set(adj)
    while True:
        drop = {v for v in active if sum(1 for n in adj[v] if n in active) < k}
        if not drop:
            break
        active -= drop
    return {v: sum(1 for n in adj[v] if n in active) for v in active}


def numpy_hits(edges: list[tuple[int, int]], tol=1e-8, max_iter=1000):
    """HITS with per-round L2 normalization: auth from old hub, hub from
    NEW auth (Kleinberg's ordering). Returns {vid: (auth, hub)}."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    src = np.array([idx[s] for s, _ in edges])
    dst = np.array([idx[d] for _, d in edges])
    auth = np.ones(n)
    hub = np.ones(n)
    for _ in range(max_iter):
        auth_new = np.zeros(n)
        np.add.at(auth_new, dst, hub[src])
        na = np.linalg.norm(auth_new)
        auth_new /= na if na > 0 else 1.0
        hub_new = np.zeros(n)
        np.add.at(hub_new, src, auth_new[dst])
        nh = np.linalg.norm(hub_new)
        hub_new /= nh if nh > 0 else 1.0
        done = max(
            np.max(np.abs(auth_new - auth)), np.max(np.abs(hub_new - hub))
        ) <= tol
        auth, hub = auth_new, hub_new
        if done:
            break
    return {v: (auth[idx[v]], hub[idx[v]]) for v in ids}


def py_walks(edges: list[tuple[int, int]], seeds: list[int], steps: int):
    """Deterministic md5-stepped walks (algorithms/walks.py semantics):
    step k from v follows out-neighbor ranked (by dst) at
    md5(f"{v}:{k}")[:15] as int mod outdeg; None-padded at sinks."""
    import hashlib

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    for v in adj:
        adj[v].sort()
    out = {}
    for s in seeds:
        path, cur = [], s
        for k in range(1, steps + 1):
            nbrs = adj.get(cur) if cur is not None else None
            if not nbrs:
                path.append(None)
                cur = None
                continue
            h = int(
                hashlib.md5(f"{cur}:{k}".encode()).hexdigest()[:15], 16
            )
            cur = nbrs[h % len(nbrs)]
            path.append(cur)
        out[s] = tuple(path)
    return out
