"""partition/: dividers, allocation, merge round-trip, and the exact-DP
block selector vs a brute-force ILP enumeration."""
import itertools

import numpy as np
import pytest

from brief_pytorch_tpu.partition.divide import (alloc_param, cal_divide_num,
                                                cal_feature, divide_data,
                                                merge_divided_data,
                                                parse_chunk_name)
from brief_pytorch_tpu.partition.tree import Tree


class TestDivideMerge:
    def test_divide_total_3d_roundtrip(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 60000, (8, 12, 16, 1)).astype(np.uint16)
        chunks, vis = divide_data(data.copy(), "total_2_3_4")
        assert len(chunks) == 24
        assert vis.shape == data.shape
        merged = merge_divided_data(chunks, data.shape)
        np.testing.assert_array_equal(merged, data)

    def test_divide_every_3d_uneven(self):
        data = np.arange(7 * 9 * 5).reshape(7, 9, 5, 1).astype(np.uint16)
        chunks, _ = divide_data(data.copy(), "every_4_4_4")
        merged = merge_divided_data(chunks, data.shape)
        np.testing.assert_array_equal(merged, data)

    def test_divide_2d(self):
        data = np.arange(12 * 8).reshape(12, 8, 1).astype(np.uint8)
        chunks, _ = divide_data(data.copy(), "total_x_3_2")
        assert len(chunks) == 6
        merged = merge_divided_data(chunks, data.shape)
        np.testing.assert_array_equal(merged, data)

    def test_chunk_names_inclusive_extents(self):
        data = np.zeros((8, 8, 8, 1), np.uint16)
        chunks, _ = divide_data(data, "total_2_2_2")
        names = sorted(c["name"] for c in chunks)
        assert names[0] == "d_0_3-h_0_3-w_0_3"
        assert "d_4_7-h_4_7-w_4_7" in names
        parsed = parse_chunk_name("d_0_3-h_4_7-w_0_3")
        assert parsed == {"d": [0, 3], "h": [4, 7], "w": [0, 3]}

    def test_cal_divide_num(self):
        n = cal_divide_num(64, 64, 64, 8, 0)
        assert int(np.prod(n)) <= 8
        assert int(np.prod(n)) == 8  # 2x2x2 fits and is most cubic
        np.testing.assert_array_equal(n, [2, 2, 2])


class TestAllocParam:
    def _chunks(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 60000, (8, 8, 8, 1)).astype(np.uint16)
        chunks, _ = divide_data(data, "total_2_2_2")
        return chunks

    @pytest.mark.parametrize("mode", ["equal", "by_size", "by_var", "by_d",
                                      "by_dv"])
    def test_budget_conserved(self, mode):
        chunks = self._chunks()
        out = alloc_param(chunks, 8000.0, mode, 0.0)
        total = sum(c["param_size"] for c in out)
        assert total == pytest.approx(8000.0, rel=1e-6)

    def test_threshold_drop_and_realloc(self):
        chunks = self._chunks()
        # equal alloc of 8000 over 8 -> 1000 each; thres 1001 would drop all,
        # use by_size on unequal chunks instead
        data = np.zeros((8, 8, 8, 1), np.uint16)
        data[:4] = 60000
        chunks, _ = divide_data(data, "every_4_8_8")
        out = alloc_param(chunks, 1000.0, "equal", 400.0)
        assert len(out) >= 1
        assert sum(c["param_size"] for c in out) == pytest.approx(1000.0)


def _brute_force_ilp(tree: Tree, Nb: int, min_level: int) -> float:
    """Direct enumeration of the reference's ILP (adaptive_blocking.py:308-340)."""
    cand = [p for p in tree.patch_list
            if (not p.prune) and p.level >= min_level]
    leaves = [p for p in tree.patch_list if not p.children]

    def genealogy(p):
        out = [p]
        while p.parent is not None:
            out.append(p.parent)
            p = p.parent
        return out

    paths = []
    for leaf in leaves:
        g = genealogy(leaf)
        unpruned = [q for q in g if not q.prune]
        exact = len(unpruned) == len(g) and len(unpruned) >= 1
        paths.append((set(id(q) for q in unpruned), exact))

    best = float("-inf")
    arity = tree.arity
    for r in range(0, Nb + 1):
        for combo in itertools.combinations(cand, r):
            ids = set(id(p) for p in combo)
            ok = True
            for members, exact in paths:
                k = len(ids & members)
                if exact and k != 1:
                    ok = False
                    break
                if not exact and k > 1:
                    ok = False
                    break
            if ok:
                val = sum(p.feature / arity ** p.level for p in combo)
                best = max(best, val)
    return best


class TestTreeDP:
    def _mk_data(self, seed, shape=(16, 16)):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 60000, shape).astype(np.uint16)

    @pytest.mark.parametrize("seed,Nb,minl", [(0, 4, 0), (1, 4, 1), (2, 7, 1),
                                              (3, 16, 2), (4, 5, 0)])
    def test_dp_equals_bruteforce_quadtree(self, seed, Nb, minl):
        data = self._mk_data(seed)
        tree = Tree(data, max_level=2, var_thr=-1, e_thr=-1)
        obj = tree.solve_optim(Nb, minl)
        ref = _brute_force_ilp(tree, Nb, minl)
        assert obj == pytest.approx(ref, rel=1e-12)
        active = tree.get_active()
        assert len(active) <= Nb
        got = sum(p.feature / tree.arity ** p.level for p in active)
        assert got == pytest.approx(obj, rel=1e-9)

    def test_dp_with_pruning(self):
        data = self._mk_data(7)
        data[:8, :8] = 0  # a flat quadrant gets pruned
        tree = Tree(data, max_level=2, var_thr=1.0, e_thr=1.0)
        assert tree.prune_count > 0
        obj = tree.solve_optim(6, 1)
        ref = _brute_force_ilp(tree, 6, 1)
        assert obj == pytest.approx(ref, rel=1e-12)

    def test_selection_is_partition_when_unpruned(self):
        """With nothing pruned, selected blocks exactly tile the volume."""
        data = self._mk_data(9, (16, 16))
        tree = Tree(data, max_level=2, var_thr=-1, e_thr=-1)
        tree.solve_optim(8, 1)
        active = tree.get_active()
        cover = np.zeros((16, 16), int)
        for p in active:
            cover[p.y:p.y + p.h, p.x:p.x + p.w] += 1
        np.testing.assert_array_equal(cover, np.ones((16, 16), int))

    def test_octree_3d(self):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 60000, (8, 8, 8)).astype(np.uint16)
        tree = Tree(data, max_level=1, var_thr=-1, e_thr=-1)
        obj = tree.solve_optim(8, 1)
        ref = _brute_force_ilp(tree, 8, 1)
        assert obj == pytest.approx(ref, rel=1e-12)
        assert len(tree.get_active()) == 8


class TestFeature:
    def test_cal_feature_flat_vs_sharp(self):
        flat = np.full((16, 16, 16), 100, np.uint16)
        rng = np.random.default_rng(0)
        sharp = rng.integers(0, 60000, (16, 16, 16)).astype(np.uint16)
        # flat block: all FFT energy at DC -> max/sum = 1
        assert cal_feature(flat[..., None]) == pytest.approx(1.0)
        assert cal_feature(sharp[..., None]) < 0.5


class TestAdaptiveInputHandling:
    """Marker clamping and grayscale scoring-input handling in
    adaptive_cal_tree / Tree.draw (reference adaptive_blocking.py:385-423)."""

    def _adaptive(self, arr, tmp_path, name):
        from brief_pytorch_tpu.io.image import save_img
        from brief_pytorch_tpu.partition.tree import adaptive_cal_tree
        p = str(tmp_path / name)
        save_img(p, arr)
        return adaptive_cal_tree(p, 4 * 1361 * 6)

    def test_uint8_volume_marker_clamps(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.integers(0, 255, (8, 16, 16, 1)).astype(np.uint8)
        tree, viz, dim = self._adaptive(vol, tmp_path, "v.tif")
        assert dim == 3 and viz.dtype == np.uint8
        assert viz.max() == 255  # marker clamped to dtype max, no overflow

    def test_rgb_volume_viz_keeps_channels(self, tmp_path):
        rng = np.random.default_rng(1)
        vol = rng.integers(0, 200, (8, 16, 16, 3)).astype(np.uint8)
        tree, viz, dim = self._adaptive(vol, tmp_path, "v.tif")
        assert viz.shape == vol.shape  # full-channel draw (broadcast marker)
        assert (viz == 255).any()

    def test_rgb_gray_uses_cv2_weights(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from brief_pytorch_tpu.partition.tree import _to_gray
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        np.testing.assert_array_equal(
            _to_gray(img), cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
        # RGBA drops alpha first
        rgba = np.concatenate([img, 255 * np.ones((16, 16, 1), np.uint8)],
                              axis=-1)
        np.testing.assert_array_equal(_to_gray(rgba), _to_gray(img))

    def test_rgba_png_adaptive_runs(self, tmp_path):
        rng = np.random.default_rng(3)
        rgba = rng.integers(0, 255, (32, 32, 4)).astype(np.uint8)
        tree, viz, dim = self._adaptive(rgba, tmp_path, "v.png")
        assert dim == 2
        assert all(p.w <= 32 and p.h <= 32 for p in tree.get_active())
