"""Tree-construction oracle: node geometry, variance/mean pruning, and FFT
feature scores of our Quad/OctTree vs the reference's (gurobipy stubbed
with a no-op Model so construction/prune/score run; the solve itself is
covered by our DP-vs-brute-force tests in test_partition.py)."""
import os
import sys
import types

import numpy as np
import pytest

from brief_pytorch_tpu.partition.tree import Tree

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount unavailable")


@pytest.fixture(scope="module")
def ref_ab():
    class _Var:
        def __init__(self, name):
            self.name = name

    class _Model:
        def addVar(self, vtype=None, name=None):
            return _Var(name)

        def remove(self, *a):
            pass

        def update(self):
            pass

        def addConstr(self, *a, **k):
            pass

        def setObjective(self, *a, **k):
            pass

    gp = types.ModuleType("gurobipy")
    gp.Model = _Model
    gp.GRB = types.SimpleNamespace(BINARY="B", MAXIMIZE=-1)
    gp.quicksum = sum
    sys.modules["gurobipy"] = gp
    if "tifffile" not in sys.modules:
        from brief_pytorch_tpu.io import image as io_image
        tf = types.ModuleType("tifffile")
        tf.imread = io_image.read_tiff
        tf.imwrite = tf.imsave = lambda p, a: io_image.save_tiff(p, a)
        sys.modules["tifffile"] = tf
    sys.path.insert(0, REF)
    try:
        import importlib
        import utils.adaptive_blocking as mod
        importlib.reload(mod)   # rebind the stubbed gurobipy
    finally:
        sys.path.remove(REF)
    return mod


def _key3(z, y, x, d, h, w):
    return (z, y, x, d, h, w)


def test_octree_geometry_prune_features_match(ref_ab):
    rng = np.random.default_rng(0)
    data = rng.random((16, 16, 16)).astype(np.float32) * 100
    data[:8, :8, :8] = 3.0   # flat low-mean region -> prunable
    ours = Tree(data.copy(), max_level=2, var_thr=1.0, e_thr=5.0)
    # the reference needs the trailing 1-channel kept: its cal_feature
    # treats 3-dim node data as a BGR image and crashes in cvtColor
    # (adaptive_blocking.py:16-21); 4-dim (d,h,w,1) takes the 3-axis FFT
    theirs = ref_ab.OctTree(data.copy()[..., None], 2, 1.0, 5.0)

    ref_nodes = {(p.level, p.orderz, p.ordery, p.orderx): p
                 for p in theirs.patch_list}
    assert len(ours.patch_list) == len(theirs.patch_list)
    for p in ours.patch_list:
        rp = ref_nodes[(p.level,) + tuple(p.order)]
        # geometry
        assert (p.z, p.y, p.x) == (rp.z, rp.y, rp.x), (p.level, p.order)
        assert (p.d, p.h, p.w) == (rp.d, rp.h, rp.w)
        # pruning decision
        assert p.prune == rp.prune, (p.level, p.order)
        # FFT sharpness feature of surviving nodes
        if not p.prune:
            np.testing.assert_allclose(p.feature, rp.feature, rtol=1e-6)


def test_quadtree_matches_geometry(ref_ab):
    """The reference's 2-D adaptive path is broken as shipped, twice over:
    QuadTree.get_feature references an undefined self.Type
    (adaptive_blocking.py:114), and its cal_feature has no 2-dim branch
    (UnboundLocalError on (h,w) node data), so a QuadTree on real data can
    never be constructed.  Geometry/pruning are oracled on a fully-pruned
    input (scoring skips pruned nodes); our 2-D features use the 2-axis
    FFT the reference's image branch would take."""
    rng = np.random.default_rng(1)
    data = (rng.random((32, 32)) * 255).astype(np.float32)
    with pytest.raises(AttributeError):     # bug 1: self.Type
        ref_ab.QuadTree(data.copy(), 2, -1, -1)
    ref_ab.QuadTree.Type = None
    with pytest.raises(UnboundLocalError):  # bug 2: no 2-dim cal_feature
        ref_ab.QuadTree(data.copy(), 2, -1, -1)

    flat = np.full((32, 32), 3.0, np.float32)   # prunes everything
    ours = Tree(flat.copy(), max_level=2, var_thr=1.0, e_thr=100.0)
    theirs = ref_ab.QuadTree(flat.copy(), 2, 1.0, 100.0)
    ref_nodes = {(p.level, p.ordery, p.orderx): p for p in theirs.patch_list}
    assert len(ours.patch_list) == len(theirs.patch_list)
    for p in ours.patch_list:
        rp = ref_nodes[(p.level,) + tuple(p.order)]
        assert (p.y, p.x, p.h, p.w) == (rp.y, rp.x, rp.h, rp.w)
        assert p.prune == rp.prune
