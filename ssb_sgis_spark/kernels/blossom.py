"""Exact minimum-weight perfect matching — the blossom algorithm.

Driver-side kernel for the Christofides tour construction
(``operators/tsp.py``): the reference delegates to
``networkx.algorithms.approximation.christofides``
(``networkanalysis/traveling_salesman.py:11-155``), whose matching step
is Edmonds' blossom algorithm.  No networkx exists in this environment,
so this module implements the classical O(n^3) primal-dual blossom
method from scratch (Edmonds 1965, "Paths, trees, and flowers"; the
stage/substage organization follows Galil, "Efficient algorithms for
finding maximum matching in graphs", ACM Computing Surveys 18(1),
1986): alternating trees grown from free vertices, odd cycles shrunk
into blossoms with dual variables, four-case dual adjustment, blossom
expansion on T-labels with zero dual.

Weights are int64 throughout (duals stay half-integral — tracked as
2x-scaled integers), so every dual update is exact and termination is
guaranteed; callers quantize float metrics (``tsp.py`` scales distances
to ~1e-12 relative resolution before calling).

Exactness is pinned by ``tests/test_blossom.py``: on hundreds of random
complete graphs the blossom optimum equals a brute-force bitmask-DP
optimum bit-for-bit, and the LP certificate (tight edges, nonnegative
slacks) is checked on every instance.
"""

from __future__ import annotations

import numpy as np

__all__ = ["min_weight_perfect_matching", "max_weight_matching"]


def min_weight_perfect_matching(d: np.ndarray) -> list[tuple[int, int]]:
    """Exact minimum-weight perfect matching over an even-order complete
    graph given its int64 weight matrix.  Returns n/2 (i, j) pairs."""
    d = np.asarray(d)
    n = len(d)
    if n % 2:
        raise ValueError(f"perfect matching needs an even vertex count, got {n}")
    if n == 0:
        return []
    if not np.issubdtype(d.dtype, np.integer):
        raise ValueError("blossom kernel expects integer weights (quantize first)")
    # minimize sum(d) == maximize sum(K - d) over perfect matchings (all
    # have the same cardinality); maxcardinality forces perfection on a
    # complete even graph
    k = int(d.max()) + 1
    w = k - d
    mate = max_weight_matching(w, maxcardinality=True)
    out = []
    for i, j in enumerate(mate):
        if j > i:
            out.append((i, int(j)))
    if len(out) != n // 2:
        raise AssertionError("matching is not perfect")  # unreachable
    return out


def max_weight_matching(w: np.ndarray, maxcardinality: bool = False) -> list[int]:
    """Maximum-weight matching on the complete graph with int64 weight
    matrix ``w`` (self-pairs ignored); with ``maxcardinality`` the
    matching has maximum cardinality and maximum weight among those.
    Returns ``mate`` with ``mate[v]`` = partner or -1.

    O(n^3): n stages, each growing a forest of alternating trees with
    delta-based dual adjustment.  Duals are kept as 2x-scaled integers
    so vertex duals may be half-integral while all arithmetic stays
    exact."""
    w = np.asarray(w)
    nvertex = len(w)
    if nvertex == 0:
        return []

    # ---- edge list over all pairs (dense complete graph) ----
    edges: list[tuple[int, int, int]] = []
    for i in range(nvertex):
        for j in range(i + 1, nvertex):
            edges.append((i, j, int(w[i, j])))
    nedge = len(edges)

    maxweight = max((wt for (_, _, wt) in edges), default=0)
    maxweight = max(0, maxweight)

    # endpoint[p]: vertex at endpoint p (edge k has endpoints 2k, 2k+1)
    endpoint = [edges[p // 2][p % 2] for p in range(2 * nedge)]
    # neighbend[v]: remote endpoints of v's edges
    neighbend: list[list[int]] = [[] for _ in range(nvertex)]
    for k, (i, j, _) in enumerate(edges):
        neighbend[i].append(2 * k + 1)
        neighbend[j].append(2 * k)

    mate = [-1] * nvertex  # mate[v] = remote ENDPOINT of v's match edge
    # label[b] for top-level blossom b: 0 free, 1 S, 2 T
    label = [0] * (2 * nvertex)
    labelend = [-1] * (2 * nvertex)
    inblossom = list(range(nvertex))
    blossomparent = [-1] * (2 * nvertex)
    blossomchilds: list[list[int] | None] = [None] * (2 * nvertex)
    blossombase = list(range(nvertex)) + [-1] * nvertex
    blossomendps: list[list[int] | None] = [None] * (2 * nvertex)
    bestedge = [-1] * (2 * nvertex)
    blossombestedges: list[list[int] | None] = [None] * (2 * nvertex)
    unusedblossoms = list(range(nvertex, 2 * nvertex))
    # duals are 2x-scaled: slack stays integral
    dualvar = [2 * maxweight] * nvertex + [0] * nvertex
    allowedge = [False] * nedge
    queue: list[int] = []

    def slack(k: int) -> int:
        (i, j, wt) = edges[k]
        return dualvar[i] + dualvar[j] - 2 * wt

    def blossom_leaves(b: int):
        if b < nvertex:
            yield b
        else:
            for t in blossomchilds[b]:
                if t < nvertex:
                    yield t
                else:
                    yield from blossom_leaves(t)

    def assign_label(v: int, t: int, p: int) -> None:
        b = inblossom[v]
        label[v] = label[b] = t
        labelend[v] = labelend[b] = p
        bestedge[v] = bestedge[b] = -1
        if t == 1:
            queue.extend(blossom_leaves(b))
        elif t == 2:
            base = blossombase[b]
            assign_label(endpoint[mate[base]], 1, mate[base] ^ 1)

    def scan_blossom(v: int, u: int) -> int:
        """Lowest common S-blossom ancestor of v and u in the forest, or
        -1 when the paths reach different roots (an augmenting path)."""
        path = []
        base = -1
        while v != -1 or u != -1:
            b = inblossom[v]
            if label[b] & 4:
                base = blossombase[b]
                break
            path.append(b)
            label[b] |= 4
            if labelend[b] == -1:
                v = -1
            else:
                v = endpoint[labelend[b]]
                b = inblossom[v]
                v = endpoint[labelend[b]]
            if u != -1:
                v, u = u, v
        for b in path:
            label[b] &= ~4
        return base

    def add_blossom(base: int, k: int) -> None:
        (v, u, _) = edges[k]
        bb = inblossom[base]
        bv = inblossom[v]
        bu = inblossom[u]
        b = unusedblossoms.pop()
        blossombase[b] = base
        blossomparent[b] = -1
        blossomparent[bb] = b
        path: list[int] = []
        endps: list[int] = []
        # trace back from v to the base
        while bv != bb:
            blossomparent[bv] = b
            path.append(bv)
            endps.append(labelend[bv])
            v = endpoint[labelend[bv]]
            bv = inblossom[v]
        path.append(bb)
        path.reverse()
        endps.reverse()
        endps.append(2 * k)
        # trace back from u to the base
        while bu != bb:
            blossomparent[bu] = b
            path.append(bu)
            endps.append(labelend[bu] ^ 1)
            u = endpoint[labelend[bu]]
            bu = inblossom[u]
        blossomchilds[b] = path
        blossomendps[b] = endps
        label[b] = 1
        labelend[b] = labelend[bb]
        dualvar[b] = 0
        for leaf in blossom_leaves(b):
            if label[inblossom[leaf]] == 2:
                queue.append(leaf)
            inblossom[leaf] = b
        # compute the blossom's best-edge lists for delta3 tracking
        bestedgeto = [-1] * (2 * nvertex)
        for bv in path:
            if blossombestedges[bv] is None:
                nblists = [
                    [p // 2 for p in neighbend[leaf]]
                    for leaf in blossom_leaves(bv)
                ]
            else:
                nblists = [blossombestedges[bv]]
            for nblist in nblists:
                for kk in nblist:
                    (i, j, _) = edges[kk]
                    if inblossom[j] == b:
                        i, j = j, i
                    bj = inblossom[j]
                    if (
                        bj != b
                        and label[bj] == 1
                        and (
                            bestedgeto[bj] == -1
                            or slack(kk) < slack(bestedgeto[bj])
                        )
                    ):
                        bestedgeto[bj] = kk
            blossombestedges[bv] = None
            bestedge[bv] = -1
        blossombestedges[b] = [kk for kk in bestedgeto if kk != -1]
        bestedge[b] = -1
        for kk in blossombestedges[b]:
            if bestedge[b] == -1 or slack(kk) < slack(bestedge[b]):
                bestedge[b] = kk

    def expand_blossom(b: int, endstage: bool) -> None:
        for s in blossomchilds[b]:
            blossomparent[s] = -1
            if s < nvertex:
                inblossom[s] = s
            elif endstage and dualvar[s] == 0:
                expand_blossom(s, endstage)
            else:
                for leaf in blossom_leaves(s):
                    inblossom[leaf] = s
        if (not endstage) and label[b] == 2:
            # relabel the children along the path from the entry child to
            # the base child; alternate T labels / unlabeled
            entrychild = inblossom[endpoint[labelend[b] ^ 1]]
            j = blossomchilds[b].index(entrychild)
            if j & 1:
                j -= len(blossomchilds[b])
                jstep = 1
                endptrick = 0
            else:
                jstep = -1
                endptrick = 1
            p = labelend[b]
            while j != 0:
                label[endpoint[p ^ 1]] = 0
                label[
                    endpoint[
                        blossomendps[b][j - endptrick] ^ endptrick ^ 1
                    ]
                ] = 0
                assign_label(endpoint[p ^ 1], 2, p)
                allowedge[blossomendps[b][j - endptrick] // 2] = True
                j += jstep
                p = blossomendps[b][j - endptrick] ^ endptrick
                allowedge[p // 2] = True
                j += jstep
            bv = blossomchilds[b][j]
            label[endpoint[p ^ 1]] = label[bv] = 2
            labelend[endpoint[p ^ 1]] = labelend[bv] = p
            bestedge[bv] = -1
            j += jstep
            while blossomchilds[b][j] != entrychild:
                bv = blossomchilds[b][j]
                if label[bv] == 1:
                    j += jstep
                    continue
                for leaf in blossom_leaves(bv):
                    if label[leaf] != 0:
                        break
                else:
                    leaf = -1
                if leaf != -1 and label[leaf] != 0:
                    label[leaf] = 0
                    label[endpoint[mate[blossombase[bv]]]] = 0
                    assign_label(leaf, 2, labelend[leaf])
                j += jstep
        label[b] = labelend[b] = -1
        blossomchilds[b] = blossomendps[b] = None
        blossombase[b] = -1
        blossombestedges[b] = None
        bestedge[b] = -1
        unusedblossoms.append(b)

    def augment_blossom(b: int, v: int) -> None:
        """Swap matched/unmatched edges inside b so that v becomes the
        blossom's base."""
        t = v
        while blossomparent[t] != b:
            t = blossomparent[t]
        if t >= nvertex:
            augment_blossom(t, v)
        i = j = blossomchilds[b].index(t)
        if i & 1:
            j -= len(blossomchilds[b])
            jstep = 1
            endptrick = 0
        else:
            jstep = -1
            endptrick = 1
        while j != 0:
            j += jstep
            t = blossomchilds[b][j]
            p = blossomendps[b][j - endptrick] ^ endptrick
            if t >= nvertex:
                augment_blossom(t, endpoint[p])
            j += jstep
            t = blossomchilds[b][j]
            if t >= nvertex:
                augment_blossom(t, endpoint[p ^ 1])
            mate[endpoint[p]] = p ^ 1
            mate[endpoint[p ^ 1]] = p
        blossomchilds[b] = blossomchilds[b][i:] + blossomchilds[b][:i]
        blossomendps[b] = blossomendps[b][i:] + blossomendps[b][:i]
        blossombase[b] = blossombase[blossomchilds[b][0]]

    def augment_matching(k: int) -> None:
        (v, u, _) = edges[k]
        for (s, p) in ((v, 2 * k + 1), (u, 2 * k)):
            while True:
                bs = inblossom[s]
                if bs >= nvertex:
                    augment_blossom(bs, s)
                mate[s] = p
                if labelend[bs] == -1:
                    break  # reached a root
                t = endpoint[labelend[bs]]
                bt = inblossom[t]
                s = endpoint[labelend[bt]]
                j = endpoint[labelend[bt] ^ 1]
                if bt >= nvertex:
                    augment_blossom(bt, j)
                mate[j] = labelend[bt]
                p = labelend[bt] ^ 1

    # ---------------------------------------------------------- stages
    for _ in range(nvertex):
        label[:] = [0] * (2 * nvertex)
        bestedge[:] = [-1] * (2 * nvertex)
        for b in range(nvertex, 2 * nvertex):
            blossombestedges[b] = None
        allowedge[:] = [False] * nedge
        queue[:] = []
        for v in range(nvertex):
            if mate[v] == -1 and label[inblossom[v]] == 0:
                assign_label(v, 1, -1)

        augmented = False
        while True:
            while queue and not augmented:
                v = queue.pop()
                for p in neighbend[v]:
                    k = p // 2
                    u = endpoint[p]
                    if inblossom[v] == inblossom[u]:
                        continue
                    if not allowedge[k]:
                        kslack = slack(k)
                        if kslack <= 0:
                            allowedge[k] = True
                    if allowedge[k]:
                        if label[inblossom[u]] == 0:
                            assign_label(u, 2, p ^ 1)
                        elif label[inblossom[u]] == 1:
                            base = scan_blossom(v, u)
                            if base >= 0:
                                add_blossom(base, k)
                            else:
                                augment_matching(k)
                                augmented = True
                                break
                        elif label[u] == 0:
                            label[u] = 2
                            labelend[u] = p ^ 1
                    elif label[inblossom[u]] == 1:
                        b = inblossom[v]
                        if bestedge[b] == -1 or kslack < slack(bestedge[b]):
                            bestedge[b] = k
                    elif label[u] == 0:
                        if bestedge[u] == -1 or kslack < slack(bestedge[u]):
                            bestedge[u] = k

            if augmented:
                break

            # ---- dual adjustment ----
            deltatype = -1
            delta = deltaedge = deltablossom = None
            if not maxcardinality:
                deltatype = 1
                delta = min(dualvar[:nvertex])
            for v in range(nvertex):
                if label[inblossom[v]] == 0 and bestedge[v] != -1:
                    d2 = slack(bestedge[v])
                    if deltatype == -1 or d2 < delta:
                        delta = d2
                        deltatype = 2
                        deltaedge = bestedge[v]
            for b in range(2 * nvertex):
                if (
                    blossomparent[b] == -1
                    and label[b] == 1
                    and bestedge[b] != -1
                ):
                    kslack = slack(bestedge[b])
                    d3 = kslack // 2
                    if deltatype == -1 or d3 < delta:
                        delta = d3
                        deltatype = 3
                        deltaedge = bestedge[b]
            for b in range(nvertex, 2 * nvertex):
                if (
                    blossombase[b] >= 0
                    and blossomparent[b] == -1
                    and label[b] == 2
                    and (deltatype == -1 or dualvar[b] < delta)
                ):
                    delta = dualvar[b]
                    deltatype = 4
                    deltablossom = b
            if deltatype == -1:
                # maxcardinality with no more progress: optimum reached
                deltatype = 1
                delta = max(0, min(dualvar[:nvertex]))

            for v in range(nvertex):
                lb = label[inblossom[v]]
                if lb == 1:
                    dualvar[v] -= delta
                elif lb == 2:
                    dualvar[v] += delta
            for b in range(nvertex, 2 * nvertex):
                if blossombase[b] >= 0 and blossomparent[b] == -1:
                    if label[b] == 1:
                        dualvar[b] += delta
                    elif label[b] == 2:
                        dualvar[b] -= delta

            if deltatype == 1:
                break
            elif deltatype == 2:
                allowedge[deltaedge] = True
                (i, j, _) = edges[deltaedge]
                if label[inblossom[i]] == 0:
                    i, j = j, i
                queue.append(i)
            elif deltatype == 3:
                allowedge[deltaedge] = True
                (i, j, _) = edges[deltaedge]
                queue.append(i)
            elif deltatype == 4:
                expand_blossom(deltablossom, False)

        if not augmented:
            break

        # end of stage: expand all S-blossoms with zero dual
        for b in range(nvertex, 2 * nvertex):
            if (
                blossomparent[b] == -1
                and blossombase[b] >= 0
                and label[b] == 1
                and dualvar[b] == 0
            ):
                expand_blossom(b, True)

    return [endpoint[mate[v]] if mate[v] >= 0 else -1 for v in range(nvertex)]
