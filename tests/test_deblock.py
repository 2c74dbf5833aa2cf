"""Deblocking filter: Python/NumPy vs native C++ equality, plus semantics.

Reference behaviours covered (deblock.py:6-136, deblock.cpp:31-321):
  * boundary-line collection from chunk dir names (2-D and 3-D, with the
    reference's z-range dedup quirk),
  * the judge test (bright-area skip, alpha/beta thresholds),
  * the 4-tap filter with clipping,
  * sequential in-place line order,
  * Python and C++ produce BIT-IDENTICAL volumes (our canonical integer
    arithmetic; the reference's own two implementations disagree in float
    vs int division, see post/deblock.py docstring).
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from brief_pytorch_tpu.io.image import read_img, save_img
from brief_pytorch_tpu.post import deblock as db

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
TOOL = os.path.join(NATIVE_DIR, "bin", "deblock")


def _blocky_volume(rng, d=16, h=32, w=32, step=8, base=1000, jump=60):
    """A smooth ramp with per-block DC offsets -> strong block edges."""
    z, y, x = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                          indexing="ij")
    vol = base + 2 * x + 3 * y + z
    offs = rng.integers(-jump, jump, (d // step, h // step, w // step))
    vol = vol + np.repeat(np.repeat(np.repeat(offs, step, 0), step, 1),
                          step, 2)
    return np.clip(vol, 0, 65535).astype(np.uint16)


def _block_names_3d(d, h, w, step):
    names = []
    for z0 in range(0, d, step):
        for y0 in range(0, h, step):
            for x0 in range(0, w, step):
                names.append(f"d_{z0}_{z0 + step - 1}-h_{y0}_{y0 + step - 1}"
                             f"-w_{x0}_{x0 + step - 1}")
    return names


class TestLineCollection:
    def test_2d_dedup(self):
        # chunk extents are inclusive, so grid neighbours contribute distinct
        # edge lines (x=15 vs x=16); only identical lines dedup.
        names = ["h_0_15-w_0_15", "h_0_15-w_16_31"]
        lines = db.collect_lines_2d(names)
        assert [16, 0, 16, 15] in lines and [15, 0, 15, 15] in lines
        assert len(lines) == len({tuple(l) for l in lines}) == 8
        assert db.collect_lines_2d(names + [names[0]]) == lines

    def test_3d_z_range_expansion(self):
        names = ["d_0_3-h_0_7-w_0_7"]
        lines = db.collect_lines_3d(names)
        # 4 boundary lines x 4 slices
        assert len(lines) == 16
        assert [0, 0, 0, 0, 7] in lines and [3, 0, 0, 0, 7] in lines

    def test_3d_dedup_quirk(self):
        """Presence is only checked at z1 (reference deblock.py:120-123):
        two blocks sharing a z-start dedup; a block starting deeper where
        the line exists only mid-range re-appends."""
        a = "d_0_3-h_0_7-w_0_7"
        b = "d_0_3-h_0_7-w_8_15"   # shares vertical edge x=8? no: w ranges differ
        lines = db.collect_lines_3d([a, b])
        # block a contributes lines at x=0 and x=7; block b at x=8 and x=15;
        # shared horizontal lines y=0/y=7 differ in x-extent so no dedup.
        assert len(lines) == 4 * 4 * 2

    def test_duplicate_blocks_dedup(self):
        a = "d_0_3-h_0_7-w_0_7"
        assert len(db.collect_lines_3d([a, a])) == 16


class TestFilterSemantics:
    def test_bright_area_skipped(self):
        win = np.array([[60000, 60000, 60000, 60000, 60000, 60000]])
        out = db.filter_line_windows(win, 51, 2000, thres=50000)
        np.testing.assert_array_equal(out, win[:, 1:5])

    def test_large_jump_skipped(self):
        # |p0-q0| >= alpha(51) ~ 289.6 -> untouched
        win = np.array([[1000, 1000, 1000, 1400, 1400, 1400]])
        out = db.filter_line_windows(win, 51, 2000, thres=65535)
        np.testing.assert_array_equal(out, win[:, 1:5])

    def test_small_jump_smoothed(self):
        win = np.array([[1000, 1000, 1000, 1100, 1100, 1100]])
        out = db.filter_line_windows(win, 51, 2000, thres=65535)
        p1, p0, q0, q1 = out[0]
        # delta0 = (4*100 + 0 + 4)//8 = 50, clipped to c0=22
        assert (p0, q0) == (1022, 1078)
        # deltap1 = (1000 + (1000+1100+1)//2 - 2000)//2 = 25 -> clip 20
        assert (p1, q1) == (1020, 1080)

    def test_filter_reduces_edge(self):
        rng = np.random.default_rng(0)
        vol = _blocky_volume(rng)[..., None]
        names = _block_names_3d(16, 32, 32, 8)
        before = np.abs(np.diff(vol[..., 0].astype(np.int64), axis=2)).sum()
        out = db.deblock_image(vol.copy(), names, 51, 2000, 65535)
        after = np.abs(np.diff(out[..., 0].astype(np.int64), axis=2)).sum()
        assert after < before


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
class TestNativeParity:
    @pytest.fixture(scope="class")
    def tool(self):
        if not os.path.exists(TOOL):
            subprocess.run(["make"], cwd=NATIVE_DIR, check=True,
                           capture_output=True)
        return TOOL

    def test_python_equals_cpp(self, tool, tmp_path):
        rng = np.random.default_rng(7)
        vol = _blocky_volume(rng)
        names = _block_names_3d(16, 32, 32, 8)

        # reference step-dir layout
        step = tmp_path / "steps100"
        (step / "decompressed").mkdir(parents=True)
        module = step / "compressed" / "module"
        for n in names:
            (module / n).mkdir(parents=True)
        save_img(str(step / "decompressed" / "vol_decompressed.tif"), vol)

        out_py = db.main(str(step))
        py = read_img(out_py)

        r = subprocess.run([tool, str(step)], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        cpp = read_img(str(step / "deblock" /
                           "vol_decompressed_deblocked_cpp.tif"))
        assert py.dtype == cpp.dtype == np.uint16
        np.testing.assert_array_equal(py, cpp)
        # and it actually changed something
        assert (py[..., 0] != vol).any()

    def test_cpp_file_mode(self, tool, tmp_path):
        rng = np.random.default_rng(3)
        vol = _blocky_volume(rng, d=8, h=16, w=16, step=8)
        names = _block_names_3d(8, 16, 16, 8)
        module = tmp_path / "module"
        for n in names:
            (module / n).mkdir(parents=True)
        inp = tmp_path / "in.tif"
        outp = tmp_path / "out.tif"
        save_img(str(inp), vol)
        r = subprocess.run([tool, "--file", str(inp), "--modules",
                            str(module), "--out", str(outp)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        cpp = read_img(str(outp))
        py = db.deblock_image(vol[..., None].copy(), names, 51, 2000, 65535)
        np.testing.assert_array_equal(py[..., 0], cpp[..., 0])
