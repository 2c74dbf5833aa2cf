"""core/: coordinates, normalisation, config."""
import numpy as np
import pytest

import jax.numpy as jnp

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.core.coords import (
    create_coords, create_flattened_coords, index_to_coords, parse_coords_mode)
from brief_pytorch_tpu.core.normalize import (
    get_type_max, invnormalize_data, normalize_data)


class TestCoords:
    def test_modes(self):
        assert parse_coords_mode("n11") == (-1.0, 1.0)
        assert parse_coords_mode("0p1") == (0.0, 1.0)
        assert parse_coords_mode("-1,1") == (-1.0, 1.0)
        assert parse_coords_mode("0,100") == (0.0, 100.0)

    def test_grid_matches_torch_linspace(self):
        torch = pytest.importorskip("torch")
        shape = (5, 7, 3)
        ref = torch.stack(torch.meshgrid(
            torch.linspace(-1, 1, 5), torch.linspace(-1, 1, 7),
            torch.linspace(-1, 1, 3), indexing="ij"), dim=-1).numpy()
        got = np.asarray(create_coords(shape, "-1,1"))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_flattened_row_major(self):
        shape = (4, 5, 6)
        flat = np.asarray(create_flattened_coords(shape))
        grid = np.asarray(create_coords(shape)).reshape(-1, 3)
        np.testing.assert_array_equal(flat, grid)

    def test_index_to_coords_matches_gather(self):
        shape = (6, 5, 4)
        flat = np.asarray(create_flattened_coords(shape, "-1,1"))
        idx = jnp.asarray([0, 1, 17, 63, 119])
        arith = np.asarray(index_to_coords(idx, shape, "-1,1"))
        np.testing.assert_allclose(arith, flat[np.asarray(idx)], atol=1e-6)

    def test_2d(self):
        flat = np.asarray(create_flattened_coords((3, 4)))
        assert flat.shape == (12, 2)


class TestNormalize:
    def test_minmaxany_roundtrip_uint16(self):
        rng = np.random.default_rng(0)
        data = rng.integers(100, 60000, (8, 9, 10, 1)).astype(np.uint16)
        norm, side = normalize_data(data, "minmaxany_0_100")
        assert norm.dtype == np.float32
        assert abs(norm.min()) < 1e-5 and abs(norm.max() - 100) < 1e-3
        back = invnormalize_data(norm, side, "minmaxany_0_100")
        assert back.dtype == np.uint16
        # quantisation error at most 1 unit of the dynamic range scale
        assert np.abs(back.astype(np.int64) - data.astype(np.int64)).max() <= 1

    def test_given_min_max(self):
        norm, side = normalize_data(np.array(65535, dtype=np.uint16),
                                    "minmaxany_0_100", min=0.0, max=65535.0)
        assert float(norm) == pytest.approx(100.0)

    def test_other_modes_roundtrip(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 255, (16, 16, 1)).astype(np.uint8)
        for mode in ["minmax01_0mean", "minmax01_0mean1std", "none"]:
            norm, side = normalize_data(data, mode)
            back = invnormalize_data(norm, side, mode)
            assert np.abs(back.astype(int) - data.astype(int)).max() <= 1

    def test_type_max(self):
        assert get_type_max(np.zeros(1, np.uint16)) == 65535
        assert get_type_max(np.zeros(1, np.uint8)) == 255
        assert get_type_max(np.zeros(1, np.float32)) == 65535


class TestConfig:
    def test_load_reference_yaml(self):
        import os
        path = "/root/reference/opt/SingleTask/default.yaml"
        if not os.path.exists(path):
            pytest.skip("reference configs unavailable")
        cfg = cfglib.load(path)
        assert cfg.CompressFramework.Name == "NFGR"
        assert cfg.CompressFramework.Compress.param.filesize_ratio == 80
        assert cfg.CompressFramework.Module.phi.name == "SIREN"
        assert cfg.CompressFramework.Compress.sampler.cube_len[0] == 10000000
        assert cfg.CompressFramework.Compress.coords_mode == "-1,1"

    def test_merge_and_dotlist(self):
        cfg = cfglib.loads("a:\n  b: 1\n  c: [1,2]\nd: x\n")
        merged = cfglib.merge(cfg, {"a": {"b": 7}})
        assert merged.a.b == 7 and merged.a.c == [1, 2] and cfg.a.b == 1
        dl = cfglib.to_dotlist(merged)
        assert "a.b=7" in dl
        rebuilt = cfglib.from_dotlist(["x.y=0.5", "x.z=true", "w=hello"])
        assert rebuilt.x.y == 0.5 and rebuilt.x.z is True and rebuilt.w == "hello"

    def test_save_load_roundtrip(self, tmp_path):
        cfg = cfglib.loads("m:\n  n: 3\n")
        p = str(tmp_path / "c.yaml")
        cfglib.save(cfg, p)
        assert cfglib.load(p).m.n == 3


class TestFastIndexMath:
    """Multiply-only index helpers used by the fleet's hot loops (TPU has
    no integer-divide hardware; traced-divisor div/mod is ~50x slower)."""

    def test_floordiv24_exact_incl_boundary(self):
        from brief_pytorch_tpu.core.coords import floordiv24
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        a = np.concatenate([rng.integers(0, 1 << 24, 20000),
                            np.asarray([0, 1, (1 << 24) - 1])]).astype(np.int32)
        for b in [1, 2, 3, 7, 63, 64, 80, 81, 511, 512, 6399, 2 ** 20 - 1]:
            got = np.asarray(floordiv24(jnp.asarray(a), b))
            np.testing.assert_array_equal(got, a // b, err_msg=f"b={b}")

    def test_flat_to_axes_and_coords_match_dynamic(self):
        from brief_pytorch_tpu.core.coords import (axes_to_coords,
                                                   flat_to_axes24,
                                                   index_to_coords_dynamic)
        import jax.numpy as jnp
        for shape in [(7, 9, 11), (80, 80, 80), (1, 5, 3), (64, 64)]:
            pop = int(np.prod(shape))
            idx = jnp.asarray(np.random.default_rng(1).integers(0, pop, 500))
            sv = jnp.asarray(shape, jnp.int32)
            axes = np.asarray(flat_to_axes24(idx, sv))
            expect = np.stack(np.unravel_index(np.asarray(idx), shape), -1)
            np.testing.assert_array_equal(axes, expect)
            got = np.asarray(axes_to_coords(flat_to_axes24(idx, sv), sv, "-1,1"))
            ref = np.asarray(index_to_coords_dynamic(idx, sv, "-1,1"))
            np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_row_major_strides(self):
        from brief_pytorch_tpu.core.coords import row_major_strides
        import jax.numpy as jnp
        s = np.asarray(row_major_strides(jnp.asarray([4, 5, 6], jnp.int32)))
        np.testing.assert_array_equal(s, [30, 6, 1])
