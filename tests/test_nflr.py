"""NFLR family: entropy coding, crop pipeline, and framework smoke tests.

Covers (reference utils/CompressFramework.py:146-642, utils/Networks.py:
929-1162, utils/dataset.py:64-195, utils/misc.py:93-232):
  * rANS codec roundtrips (shared-CDF and per-channel),
  * factorized entropy model: valid pmf, bitstream roundtrip == quantised,
  * Gaussian conditional: index building + bitstream roundtrip,
  * crop_data slicing + reconstruct_cropped overlap merge,
  * modulated SIREN synthesis shapes,
  * NFLR_AutoDecoder / NFLR_Coding_AutoDecoder / Hyper end-to-end on tiny
    synthetic volumes (train a few steps, compress, decompress).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # NFLR training loops

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.io.image import save_img
from brief_pytorch_tpu.nflr import entropy as em
from brief_pytorch_tpu.nflr import rans
from brief_pytorch_tpu.nflr.crop import (CroppedSampler, crop_data,
                                         reconstruct_cropped)
from brief_pytorch_tpu.nflr.networks import init_gmod, siren_forward_syn


class TestRans:
    def test_roundtrip_shared_cdf(self):
        rng = np.random.default_rng(0)
        pmf = rng.dirichlet(np.ones(33))
        cdf = rans.quantize_pmf(pmf)
        syms = rng.choice(33, 4000, p=pmf)
        blob = rans.encode(syms, cdf)
        assert np.array_equal(rans.decode(blob, len(syms), cdf), syms)
        # near entropy-optimal
        bound = -np.sum(np.log2(pmf[syms])) / 8
        assert len(blob) < bound * 1.05 + 16

    def test_roundtrip_per_channel(self):
        rng = np.random.default_rng(1)
        cdfs = [rans.quantize_pmf(rng.dirichlet(np.ones(9)))
                for _ in range(5)]
        ch = rng.integers(0, 5, 1000)
        syms = rng.integers(0, 9, 1000)
        blob = rans.encode_per_channel(syms, cdfs, ch)
        assert np.array_equal(rans.decode_per_channel(blob, cdfs, ch), syms)

    def test_quantize_pmf_properties(self):
        cdf = rans.quantize_pmf(np.asarray([0.9, 0.0999, 1e-4, 1e-9]))
        assert cdf[0] == 0 and cdf[-1] == 1 << rans.PRECISION
        assert (np.diff(cdf) >= 1).all()


class TestFactorized:
    def test_likelihood_is_density(self):
        params = em.factorized_init(jax.random.PRNGKey(0), 3)
        xs = jnp.arange(-150, 151, dtype=jnp.float32)
        flat = jnp.tile(xs[None, None, :], (3, 1, 1))
        lik = np.asarray(em.factorized_likelihood(params, flat))
        assert (lik > 0).all() and (lik <= 1).all()
        assert abs(lik.sum(-1) - 1).max() < 0.05  # integrates to ~1

    def test_bitstream_roundtrip(self):
        params = em.factorized_init(jax.random.PRNGKey(1), 4, init_scale=10)
        tables = em.factorized_build_tables(params)
        rng = np.random.default_rng(2)
        y = rng.normal(0, 3, (2, 4, 3, 3, 3)).astype(np.float32)
        strings = em.factorized_compress(params, tables, y)
        assert len(strings) == 2
        back = em.factorized_decompress(params, tables, strings, (3, 3, 3))
        med = tables["medians"].reshape(1, 4, 1, 1, 1)
        expect = np.round(y - med) + med
        np.testing.assert_allclose(back, expect, atol=1e-5)

    def test_forward_training_noise(self):
        params = em.factorized_init(jax.random.PRNGKey(3), 2)
        y = jnp.zeros((1, 2, 4, 4, 4))
        y_t, lik = em.factorized_forward(params, y, jax.random.PRNGKey(4),
                                         training=True)
        assert y_t.shape == y.shape and lik.shape == y.shape
        assert float(jnp.abs(y_t).max()) <= 0.5

    def test_quantile_loss_decreases(self):
        import optax
        params = em.factorized_init(jax.random.PRNGKey(5), 2)
        tx = optax.adam(1e-2)
        opt = tx.init(params["quantiles"])
        l0 = float(em.quantile_loss(params))
        for _ in range(50):
            g = jax.grad(lambda q: em.quantile_loss(
                {**params, "quantiles": q}))(params["quantiles"])
            upd, opt = tx.update(g, opt, params["quantiles"])
            params = {**params,
                      "quantiles": optax.apply_updates(params["quantiles"],
                                                       upd)}
        assert float(em.quantile_loss(params)) < l0


class TestGaussian:
    def test_roundtrip(self):
        tables = em.GaussianTables.build()
        rng = np.random.default_rng(0)
        scales = rng.uniform(0.2, 20, (2, 3, 4, 4, 4))
        means = rng.normal(0, 2, scales.shape)
        y = means + scales * rng.normal(0, 1, scales.shape)
        idx = em.build_indexes(scales, tables.scale_table)
        strings = em.gaussian_compress(tables, y, idx, means)
        back = em.gaussian_decompress(tables, strings, idx, means)
        np.testing.assert_allclose(back, np.round(y - means) + means,
                                   atol=1e-5)

    def test_build_indexes_covers(self):
        tables = em.GaussianTables.build()
        scales = np.asarray([0.01, 0.11, 1.0, 255.9])
        idx = em.build_indexes(scales, tables.scale_table)
        assert (tables.scale_table[idx] >= np.maximum(scales, 0.11) - 1e-6).all()
        # above the table max -> clamped to the last level
        assert em.build_indexes(np.asarray([300.0]),
                                tables.scale_table)[0] == len(tables.cdfs) - 1


class TestCrop:
    def test_crop_matches_slicing(self):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(2, 1, 8, 12, 12)).astype(np.float32)
        cropped, pc = crop_data(data, ps_h=8, ps_w=8, ol_h=4, ol_w=4,
                                ps_d=4, ol_d=2)
        assert pc == (3, 2, 2)
        assert cropped.shape == (2, 3, 2, 2, 1, 4, 8, 8)
        np.testing.assert_array_equal(cropped[:, 0, 0, 0],
                                      data[:, :, :4, :8, :8])
        # last patch pinned to the end
        np.testing.assert_array_equal(cropped[:, 2, 1, 1],
                                      data[:, :, 4:8, 4:12, 4:12])

    def test_sampler_covers_population(self):
        rng = np.random.default_rng(1)
        data = rng.normal(size=(1, 1, 4, 4, 4)).astype(np.float32)
        cropped, pc = crop_data(data, ps_h=4, ps_w=4, ol_h=0, ol_w=0,
                                ps_d=4, ol_d=0)
        sampler = CroppedSampler(cropped, sample_size=16, seed=0)
        seen = []
        for coords, values in sampler:
            assert coords.shape[:-2] == (1, 1, 1, 1)
            seen.append(np.asarray(values).reshape(-1))
        assert sorted(np.concatenate(seen).tolist()) == \
            sorted(data.reshape(-1).tolist())

    def test_reconstruct_constant_merge(self):
        """A constant field must merge to the same constant regardless of
        the overlap weighting."""
        def nf(coords, mods):
            return jnp.full(coords.shape[:-1] + (1,), 7.0)

        out = reconstruct_cropped((1, 1, 8, 8, 8), 64, None, nf,
                                  ps_h=4, ps_w=4, ol_h=2, ol_w=2,
                                  ps_d=4, ol_d=2)
        np.testing.assert_allclose(out, 7.0, rtol=1e-6)


class TestModulatedSiren:
    def test_shapes_and_modulation_effect(self):
        from brief_pytorch_tpu.models.phi import init_phi
        phi = init_phi({"name": "SIREN", "coords_channel": 3,
                        "data_channel": 1, "features": 16, "layers": 4,
                        "w0": 30})
        pp = phi.init(jax.random.PRNGKey(0))
        gmod = init_gmod(name="CropModulator", y_channel=8, dim_hidden=16,
                         layers=3)
        gp = gmod.init(jax.random.PRNGKey(1))
        y = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 2, 2, 2))
        mods = gmod.apply(gp, y)
        assert len(mods) == 3 and mods[0].shape == (2, 16, 2, 2, 2)
        coords = jax.random.uniform(jax.random.PRNGKey(3),
                                    (2, 2, 2, 2, 10, 3), minval=-1)
        out = siren_forward_syn(pp["layers"], coords, mods)
        assert out.shape == (2, 2, 2, 2, 10, 1)
        out2 = siren_forward_syn(pp["layers"], coords,
                                 gmod.apply(gp, y + 1.0))
        assert not np.allclose(out, out2)  # modulation changes the field


# ---------------------------------------------------------------------------
# end-to-end framework smoke tests
# ---------------------------------------------------------------------------
def _nflr_opt(name: str) -> cfglib.Config:
    return cfglib.loads(f"""
Name: {name}
seed: 0
Module:
  phi: {{name: SIREN, coords_channel: 3, data_channel: 1, features: 16,
        layers: 4, w0: 30, res: false, output_act: false}}
  gmod: {{name: CropModulator, y_channel: 8}}
  crop: {{ps_d: 8, ps_h: 8, ps_w: 8, ol_d: 2, ol_h: 2, ol_w: 2}}
  hy: {{name: CropConv3dStridedown}}
  hz: {{name: PlainConv3dChannelShrink}}
  gy: {{name: PlainConv3dMeanScale, z_channel: 4, layers: 2}}
  emy: {{name: UnivariateNonParametricEntropyModel, init_scale: 10,
        optimizer_name_quantiles: Adam, lr_quantiles: 0.001}}
  emz: {{name: UnivariateNonParametricEntropyModel, init_scale: 10,
        optimizer_name_quantiles: Adam, lr_quantiles: 0.001}}
  emyz: {{name: GaussianConditionalEntropyModel, scale_bound: 0.11,
         tail_mass: 1.0e-9}}
Train:
  gpu: false
  batch_size: 1
  sample_size: 128
  max_steps: 4
  log_every_n_step: 2
  val_every_n_step: 1000000
  val_every_n_epoch: 1000000
  val_data_quanity: 1
  optimizer_name_module: Adam
  lr_module: 0.0001
  optimizer_name_y: Adam
  lr_y: 0.01
  optimizer_name_z: Adam
  lr_z: 0.01
  argmin_steps: 2
  Lambda: 100
Compress:
  gpu: false
  sample_size: 128
  max_steps: 6
  optimizer_name_y: Adam
  lr_y: 0.01
  optimizer_name_z: Adam
  lr_z: 0.01
  hy_bs: 0
  annealing_rate: 0.001
  init_temperature: 0.5
  annealing_scheme: exp0
  t0: 700
Decompress:
  gpu: false
  sample_size: 128
Normalize: {{name: minmaxany_0_100}}
""")


@pytest.fixture(scope="module")
def tiny_volumes(tmp_path_factory):
    d = tmp_path_factory.mktemp("nflr_data")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        z, y, x = np.meshgrid(*[np.linspace(0, 1, 16)] * 3, indexing="ij")
        vol = (20000 + 20000 * np.sin(4 * z + i) * np.cos(3 * y) * x
               + rng.normal(0, 200, (16, 16, 16)))
        path = str(d / f"vol{i}.tif")
        save_img(path, np.clip(vol, 0, 65535).astype(np.uint16)[..., None])
        paths.append(path)
    return paths


class TestFrameworks:
    def _fw(self, name):
        from brief_pytorch_tpu.nflr.framework import init_compressframework
        return init_compressframework(_nflr_opt(name))

    def test_autodecoder_e2e(self, tiny_volumes, tmp_path):
        fw = self._fw("NFLR_AutoDecoder")
        comp_path = str(tmp_path / "c.bin")
        compressed = fw.compress(tiny_volumes, comp_path)
        assert compressed["y"].shape == (2, 8, 3, 3, 3)
        dec = fw.decompress(compressed_data=compressed)
        assert dec.shape == (2, 1, 16, 16, 16) and dec.dtype == np.uint16
        dec2 = fw.decompress(compressed_data_path=comp_path)
        np.testing.assert_array_equal(dec, dec2)

    def test_autodecoder_training_reduces_loss(self, tiny_volumes):
        fw = self._fw("NFLR_AutoDecoder")
        from brief_pytorch_tpu.nflr.crop import CropDataset
        ds = CropDataset(2, 128, fw.opt.Normalize, None, fw.opt.Module.crop,
                         False, True, data_path_list=tiny_volumes, seed=0)
        cropped, sampler, pc_shape, side = next(iter(ds))
        import optax
        from brief_pytorch_tpu.train.optim import make_optimizer
        tx = make_optimizer("Adam", 1e-3)
        opt_state = tx.init(fw._module_params())
        losses = []
        for _ in range(12):
            for coords, values in sampler:
                loss, opt_state = fw.training_step(
                    cropped, pc_shape, side, coords, values, tx, opt_state)
                losses.append(float(loss))
        # batches vary per step (fresh y0 + sampler reseeding), so compare
        # averaged early vs late loss rather than two noisy endpoints
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_coding_autodecoder_bitstream(self, tiny_volumes, tmp_path):
        fw = self._fw("NFLR_Coding_AutoDecoder")
        comp_path = str(tmp_path / "c.zip")
        compressed = fw.compress(tiny_volumes, comp_path)
        assert len(compressed["y_strings"]) == 2
        assert all(isinstance(s, bytes) for s in compressed["y_strings"])
        dec = fw.decompress(compressed_data_path=comp_path)
        assert dec.shape == (2, 1, 16, 16, 16)
        # compressed file exists and is small
        import os
        assert 0 < os.path.getsize(comp_path) < 16 * 16 * 16 * 2 * 2

    def test_autoencoder_e2e(self, tiny_volumes, tmp_path):
        fw = self._fw("NFLR_AutoEncoder")
        compressed = fw.compress(tiny_volumes, str(tmp_path / "c.bin"))
        assert compressed["y"].shape == (2, 8, 3, 3, 3)
        dec = fw.decompress(compressed_data=compressed)
        assert dec.shape == (2, 1, 16, 16, 16)

    def test_hyper_autodecoder_e2e(self, tiny_volumes, tmp_path):
        fw = self._fw("NFLR_Coding_Hyper_AutoDecoder")
        comp_path = str(tmp_path / "c.zip")
        compressed = fw.compress(tiny_volumes, comp_path)
        assert len(compressed["y_strings"]) == 2
        assert len(compressed["z_strings"]) == 2
        dec = fw.decompress(compressed_data_path=comp_path)
        assert dec.shape == (2, 1, 16, 16, 16)

    def test_hyper_autoencoder_training_step(self, tiny_volumes):
        fw = self._fw("NFLR_Coding_Hyper_AutoEncoder")
        from brief_pytorch_tpu.nflr.crop import CropDataset
        from brief_pytorch_tpu.train.optim import make_optimizer
        ds = CropDataset(2, 128, fw.opt.Normalize, None, fw.opt.Module.crop,
                         False, True, data_path_list=tiny_volumes, seed=0)
        cropped, sampler, pc_shape, side = next(iter(ds))
        tx = make_optimizer("Adam", 1e-4)
        keys = ("phi", "gmod", "gy", "emz", "hy", "hz")
        opt_state = tx.init({k: fw.params[k] for k in keys})
        coords, values = next(iter(sampler))
        loss, _ = fw.training_step(cropped, pc_shape, side, coords, values,
                                   tx, opt_state)
        assert np.isfinite(float(loss))

    def test_save_load_roundtrip(self, tmp_path):
        fw = self._fw("NFLR_AutoDecoder")
        for method in ("torchsave", "torchsave_7z", "numpysave",
                       "numpysave_7z"):
            p = str(tmp_path / f"m_{method}")
            fw.save_module(p, method)
            fw2 = self._fw("NFLR_AutoDecoder")
            fw2.load_module(p, method)
            for a, b in zip(jax.tree_util.tree_leaves(fw.params),
                            jax.tree_util.tree_leaves(fw2.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEscapeCoding:
    """Out-of-table symbols must round-trip via the bypass/escape path
    (compressai's backend bypass-codes them; silent clipping would corrupt
    outlier latents)."""

    def test_factorized_outlier_roundtrip(self):
        key = jax.random.PRNGKey(0)
        params = em.factorized_init(key, channels=3)
        tables = em.factorized_build_tables(params)
        rng = np.random.default_rng(0)
        y = rng.normal(0, 2, (2, 3, 3, 3, 3)).astype(np.float32)
        y[0, 1, 0, 0, 0] = 500.0    # far outside the quantile range
        y[1, 2, 1, 1, 1] = -500.0
        strings = em.factorized_compress(params, tables, y)
        back = em.factorized_decompress(params, tables, strings, (3, 3, 3))
        med = tables["medians"].reshape(1, 3, 1, 1, 1)
        np.testing.assert_array_equal(back,
                                      np.round(y - med) + med)

    def test_gaussian_outlier_roundtrip(self):
        tables = em.GaussianTables.build()
        rng = np.random.default_rng(1)
        scales = np.abs(rng.normal(1, 0.5, (2, 4, 2, 2, 2))) + 0.2
        idx = em.build_indexes(scales, tables.scale_table)
        y = rng.normal(0, 1, scales.shape).astype(np.float32)
        y[0, 0, 0, 0, 0] = 1e5      # way beyond any table tail
        strings = em.gaussian_compress(tables, y, idx)
        back = em.gaussian_decompress(tables, strings, idx)
        np.testing.assert_array_equal(back, np.round(y))


class TestTrainEntry:
    """fw.train() must run for EVERY framework variant: the optimizer must
    be initialized over the exact tree training_step optimizes (the hyper
    variants' training trees are supersets of their _module_params — this
    crashed with a pytree-structure mismatch before _train_params)."""

    @pytest.mark.parametrize("name", [
        "NFLR_AutoDecoder",
        "NFLR_AutoEncoder",
        "NFLR_Coding_AutoDecoder",
        "NFLR_Coding_AutoEncoder",
        "NFLR_Coding_Hyper_AutoDecoder",
        "NFLR_Coding_Hyper_AutoEncoder",
    ])
    def test_train_runs(self, name, tiny_volumes, tmp_path, monkeypatch):
        import shutil
        from brief_pytorch_tpu.nflr.framework import init_compressframework
        fw = init_compressframework(_nflr_opt(name))
        train_dir = tmp_path / "train"
        val_dir = tmp_path / "val"
        train_dir.mkdir(), val_dir.mkdir()
        for p in tiny_volumes:
            shutil.copy(p, train_dir)
        shutil.copy(tiny_volumes[0], val_dir)
        fw.opt.Train.train_data_dir = str(train_dir)
        fw.opt.Train.val_data_dir = str(val_dir)
        fw.opt.Train.max_steps = 2
        fw.train(str(tmp_path / "run"))
        # final checkpoint written
        import os
        trained = os.listdir(tmp_path / "run" / "trained_module")
        assert any(f.endswith(".pt") for f in trained)


class TestEscapeOverflow:
    def test_int32_bypass_range_checked(self):
        """Escaped (bypass) symbols are stored as int32; values beyond that
        range must raise instead of silently truncating (ADVICE r1)."""
        from brief_pytorch_tpu.nflr.entropy import _encode_with_escape
        cdf = rans.quantize_pmf(np.asarray([0.5, 0.3, 0.2]))
        n_syms = np.asarray([1, 1])   # alphabet 1 + escape
        sym = np.asarray([0, 2 ** 32], dtype=np.int64)
        with pytest.raises(OverflowError, match="int32"):
            _encode_with_escape(sym, n_syms, [cdf, cdf], np.asarray([0, 1]))


def test_bits_roundtrip_at_realistic_scale(tmp_path):
    """Bits round trip at the converged-run scale (VERDICT r1 item 3): the
    64^3 fixture's 11^3 patch grid with y_channel=24 (31,944 latents) —
    compress to the rANS container, then decode from memory and from the
    file and require byte-equal volumes."""
    import os
    from tests.conftest import REFERENCE_FIXTURE
    from brief_pytorch_tpu.nflr.framework import init_compressframework
    if not os.path.exists(REFERENCE_FIXTURE):
        pytest.skip("fixture not available")
    opt = _nflr_opt("NFLR_Coding_AutoDecoder")
    opt.Module.gmod.y_channel = 24
    opt.Module.crop = cfglib.loads(
        "{ps_d: 8, ps_h: 8, ps_w: 8, ol_d: 2, ol_h: 2, ol_w: 2}")
    opt.Compress.max_steps = 20
    opt.Compress.sample_size = 64
    fw = init_compressframework(opt)
    comp_path = str(tmp_path / "big.zip")
    compressed = fw.compress([REFERENCE_FIXTURE], comp_path)
    assert np.prod(compressed["sideinfos"]["y_shape"]) == 11 ** 3
    dec_mem = fw.decompress(compressed_data=compressed)
    dec_file = fw.decompress(compressed_data_path=comp_path)
    assert dec_mem.shape == (1, 1, 64, 64, 64)
    np.testing.assert_array_equal(dec_mem, dec_file)
