"""Adaptive blocking: quadtree/octree over the volume with optimal block
selection — license-free replacement for the reference's Gurobi ILP.

The reference (utils/adaptive_blocking.py:60-423) builds a full tree to
max_level, prunes flat patches (variance & mean thresholds), scores the rest
with the FFT sharpness feature, and solves a binary ILP with Gurobi:

    maximize   sum_i  feature_i * x_i / (arity^level_i)
    subject to sum_i x_i <= Nb
               x_i = 0            for level_i < min_level or pruned i
               for every deepest-level leaf's root-to-leaf genealogy G:
                   sum_{i in G, unpruned} x_i == 1   if no member of G pruned
                   sum_{i in G, unpruned} x_i <= 1   otherwise
      (adaptive_blocking.py:308-340)

Because pruning cascades downward (prune() removes whole subtrees,
adaptive_blocking.py:341-352), the unpruned set is upward-closed and the ILP
decomposes over the tree: selecting a node covers all paths through it and
forbids selections below; unselected internal nodes delegate coverage to
their children.  That makes the problem an exact bottom-up knapsack DP:

    A[v][k] = best objective in subtree(v) using <= k selections such that
              every fully-unpruned leaf path inside subtree(v) is covered
              exactly once and no path carries two selections
    A[v][k] = max( val(v)                      if v selectable, k >= 1
                 , knapsack over unpruned children of A[child][.] )
    with A[leaf][k] = -inf when the unpruned leaf cannot be selected.

A[root][Nb] equals the ILP optimum (verified against brute force in
tests/test_partition.py).  No native solver, no license.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from brief_pytorch_tpu.partition.divide import cal_feature

NEG_INF = float("-inf")


@dataclass
class Patch:
    """One tree node: an axis-aligned sub-block of the volume.

    Mirrors Patch2d/Patch3d (reference adaptive_blocking.py:25-58,199-236)
    with x/y[/z] origin and w/h[/d] extents.
    """
    level: int
    order: Tuple[int, ...]           # per-axis order (z, y, x) or (y, x)
    parent: Optional["Patch"] = None
    children: List["Patch"] = field(default_factory=list)
    prune: bool = False
    feature: float = 0.0
    selected: bool = False
    # geometry (filled by Tree.init_data)
    x: int = 0
    y: int = 0
    z: int = 0
    w: int = 0
    h: int = 0
    d: int = 0
    data: Optional[np.ndarray] = None


class Tree:
    """Quadtree (ndim=2) / octree (ndim=3) with exact DP block selection."""

    def __init__(self, data: np.ndarray, max_level: int, var_thr: float,
                 e_thr: float):
        if data.ndim == 4 and data.shape[-1] == 1:
            data = data[..., 0]
        self.data = data
        self.ndim = data.ndim
        assert self.ndim in (2, 3), "data must be 2d or 3d (single channel)"
        self.arity = 2 ** self.ndim
        self.max_level = max_level
        for s in data.shape:
            assert s % (2 ** max_level) == 0, "image size error!"
        self.root = Patch(level=0, order=(0,) * self.ndim)
        self._build(self.root)
        self.patch_list: List[Patch] = []
        self._collect(self.root)
        self._init_data()
        self._prune(var_thr, e_thr)
        self._score()

    # ------------------------------------------------------------- build --
    def _build(self, parent: Patch):
        if parent.level >= self.max_level:
            return
        ranges = [range(2)] * self.ndim
        import itertools
        for combo in itertools.product(*ranges):
            order = tuple(2 * o + c for o, c in zip(parent.order, combo))
            child = Patch(level=parent.level + 1, order=order, parent=parent)
            parent.children.append(child)
            self._build(child)

    def _collect(self, patch: Patch):
        self.patch_list.append(patch)
        for c in patch.children:
            self._collect(c)

    def _init_data(self):
        shape = self.data.shape
        for p in self.patch_list:
            sizes = [s // (2 ** p.level) for s in shape]
            starts = [sz * o for sz, o in zip(sizes, p.order)]
            if self.ndim == 3:
                p.d, p.h, p.w = sizes
                p.z, p.y, p.x = starts
                p.data = self.data[p.z:p.z + p.d, p.y:p.y + p.h,
                                   p.x:p.x + p.w]
            else:
                p.h, p.w = sizes
                p.y, p.x = starts
                p.data = self.data[p.y:p.y + p.h, p.x:p.x + p.w]

    # ------------------------------------------------------------- prune --
    def _prune(self, var_thr: float, e_thr: float):
        """Deactivate flat subtrees (reference adaptive_blocking.py:341-352):
        variance <= var_thr AND |mean| <= e_thr prunes the node and every
        descendant."""
        count = 0
        for p in self.patch_list:
            if p.prune:
                continue
            d = p.data.astype(np.float64)
            if ((d - d.mean()) ** 2).mean() <= var_thr and abs(d.mean()) <= e_thr:
                stack = [p]
                while stack:
                    q = stack.pop()
                    if not q.prune:
                        q.prune = True
                        count += 1
                    stack.extend(q.children)
        self.prune_count = count

    def _score(self):
        for p in self.patch_list:
            if not p.prune:
                # 3-D node data must reach cal_feature 4-dim so it takes the
                # 3-axis FFT branch: cal_feature's 3-dim convention means
                # "(h,w,c) image" (2-axis FFT), which would mis-score volume
                # nodes (the reference keeps a trailing 1-channel on its
                # octree nodes for the same reason, adaptive_blocking.py:246)
                d = p.data[..., None] if self.ndim == 3 else p.data
                p.feature = cal_feature(d)

    # ------------------------------------------------------------- solve --
    def solve_optim(self, Nb: int, min_level: int) -> float:
        """Exact DP equal to the Gurobi ILP optimum.  Marks .selected."""
        self.Nb = Nb

        def value(p: Patch) -> float:
            return p.feature / (self.arity ** p.level)

        # A[p] = np array over budget 0..cap; choice[p] = per-budget decision
        tables: Dict[int, np.ndarray] = {}
        choices: Dict[int, list] = {}

        def solve(p: Patch) -> np.ndarray:
            leaves_below = self.arity ** (self.max_level - p.level)
            cap = min(Nb, leaves_below)
            selectable = (not p.prune) and p.level >= min_level
            kids = [c for c in p.children if not c.prune]
            if not p.children:  # deepest level
                A = np.full(cap + 1, NEG_INF)
                ch = [None] * (cap + 1)
                if selectable and cap >= 1:
                    A[1:] = value(p)
                    for k in range(1, cap + 1):
                        ch[k] = "select"
                tables[id(p)] = A
                choices[id(p)] = ch
                return A
            # combine children (pruned children: no requirement, 0 value)
            comb = np.zeros(1)
            splits: List[list] = [[()]]
            child_tables = []
            for c in kids:
                child_tables.append(solve(c))
            comb = np.zeros(cap + 1)
            feasible = np.ones(cap + 1, bool)
            # knapsack: comb[j] = max over allocations to children
            cur = np.zeros(1)
            cur_alloc = [[] for _ in range(1)]
            cur = np.array([0.0])
            alloc: List[Optional[tuple]] = [()]
            for ci, At in enumerate(child_tables):
                m = min(cap, len(cur) - 1 + len(At) - 1)
                new = np.full(m + 1, NEG_INF)
                new_alloc: List[Optional[tuple]] = [None] * (m + 1)
                for a in range(len(cur)):
                    if cur[a] == NEG_INF or alloc[a] is None:
                        continue
                    for b in range(len(At)):
                        if At[b] == NEG_INF:
                            continue
                        j = a + b
                        if j > m:
                            break
                        v = cur[a] + At[b]
                        if v > new[j]:
                            new[j] = v
                            new_alloc[j] = alloc[a] + (b,)
                cur, alloc = new, new_alloc
            # pad to cap+1 and make monotone (<=k means best over <=k)
            A = np.full(cap + 1, NEG_INF)
            ch: List = [None] * (cap + 1)
            upto = min(cap, len(cur) - 1)
            best_v, best_a = NEG_INF, None
            for k in range(cap + 1):
                if k <= upto and cur[k] > best_v:
                    best_v, best_a = cur[k], alloc[k]
                if best_a is not None:
                    A[k] = best_v
                    ch[k] = ("children", best_a)
            if selectable:
                v = value(p)
                for k in range(1, cap + 1):
                    if v > A[k]:
                        A[k] = v
                        ch[k] = "select"
            tables[id(p)] = A
            choices[id(p)] = ch
            return A

        A_root = solve(self.root)
        k_best = int(np.argmax(A_root))
        obj = A_root[k_best]
        assert obj > NEG_INF, "infeasible: Nb too small for min_level"

        # backtrack
        def mark(p: Patch, k: int):
            ch = choices[id(p)][k]
            if ch == "select":
                p.selected = True
                return
            assert ch is not None
            _, split = ch
            kids = [c for c in p.children if not c.prune]
            # the stored split was computed at some k' <= k with same value;
            # recompute the achieving budget
            for c, b in zip(kids, split):
                mark(c, b)

        # find smallest k achieving obj (splits stored per exact k)
        for k in range(len(A_root)):
            if A_root[k] == obj:
                mark(self.root, k)
                break
        self.objective = float(obj)
        return self.objective

    def get_active(self) -> List[Patch]:
        return [p for p in self.patch_list if (not p.prune) and p.selected]

    # -------------------------------------------------------------- draw --
    def draw(self, data: np.ndarray) -> np.ndarray:
        """Draw selected-block boundaries (value 2000 for 3-D, red rect for
        2-D) — reference adaptive_blocking.py:115-123,360-373."""
        # clamp the boundary marker to the dtype range (the reference's
        # bare 2000 overflows uint8 volumes)
        marker = 2000
        if np.issubdtype(data.dtype, np.integer):
            marker = min(2000, int(np.iinfo(data.dtype).max))
        for p in self.get_active():
            if self.ndim == 3:
                x, y, z, w, h, d = p.x, p.y, p.z, p.w, p.h, p.d
                data[z, y:y + h, x:x + w] = marker
                data[z + d - 1, y:y + h, x:x + w] = marker
                data[z:z + d, y, x:x + w] = marker
                data[z:z + d, y + h - 1, x:x + w] = marker
                data[z:z + d, y:y + h, x] = marker
                data[z:z + d, y:y + h, x + w - 1] = marker
            else:
                try:
                    import cv2
                    cv2.rectangle(data, (p.x, p.y), (p.x + p.w, p.y + p.h),
                                  (0, 0, 255), 2)
                except Exception:
                    pass
        return data


# alias names mirroring the reference API
QuadTree = Tree
OctTree = Tree


def _to_gray(rgb: np.ndarray) -> np.ndarray:
    """Grayscale for FFT scoring with cv2's RGB2GRAY weights (the
    reference's scoring input, adaptive_blocking.py:391-406); channels
    beyond 3 (e.g. RGBA pngs) are dropped first."""
    from brief_pytorch_tpu.io.image import _HAS_CV2
    rgb = rgb[..., :3]
    if rgb.shape[-1] == 1:
        return rgb[..., 0]
    if _HAS_CV2:
        import cv2
        return cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    return rgb.mean(-1).astype(rgb.dtype)


def adaptive_cal_tree(img_path: str, param_size: float, var_thr: float = -1,
                      e_thr: float = -1, gpu_limit: int = 1024000,
                      maxl: int = -1, minl: int = -1, Nb: int = -1):
    """Build + solve the adaptive tree for a volume/image file
    (reference adaptive_blocking.py:385-423).

    Nb defaults to param_size/(4*1361) — the average SIREN block heuristic;
    minl = floor(log_{arity}(Nb)) so blocks are as uniform as possible;
    maxl = minl + 2.
    """
    from brief_pytorch_tpu.io.image import get_dimension, read_img
    dimension = get_dimension(img_path)
    img = read_img(img_path)
    data = img.copy()
    if data.ndim == 4:
        if data.shape[-1] == 1:
            data = data[..., 0]
        else:
            data = np.stack([_to_gray(data[i]) for i in range(data.shape[0])])
    elif data.ndim == 3:
        data = _to_gray(data) if data.shape[-1] > 1 else data[..., 0]
    if Nb == -1:
        Nb = max(1, int(param_size / (4 * 1361)))
    minl_calc = math.floor(math.log(Nb, 2 ** dimension)) if Nb > 1 else 0
    if minl == -1 or maxl == -1:
        minl = minl_calc
        maxl = minl + 2
    tree = Tree(data, maxl, var_thr, e_thr)
    tree.solve_optim(Nb, minl)
    # draw into the FULL original array: for (d,h,w,c) the 3-D indexing
    # broadcasts the marker across channels, exactly as the reference's
    # draw on its full save_data does (adaptive_blocking.py:417-419)
    save_data = tree.draw(img.copy())
    return tree, save_data, dimension
