"""Pre/post-processing rules: per-voxel loss weights (quantile/value/exp),
checkpoint schedules, denoise/clip (reference utils/misc.py:244-310,
255-271)."""
import numpy as np
import pytest

from brief_pytorch_tpu.post.preprocess import (parse_checkpoints,
                                               parse_weight, preprocess)


class TestParseWeight:
    def test_value_rule(self):
        data = np.array([[0, 100, 200, 300]], np.uint16)
        w = parse_weight(data, ["value_100_200_0.5"])
        np.testing.assert_array_equal(w, [[1.0, 0.5, 0.5, 1.0]])

    def test_value_rule_rejects_out_of_dtype_range(self):
        """range_limit asserts bounds within [0, dtype max]
        (reference utils/tool.py:26-30)."""
        data = np.array([0, 255], np.uint8)
        with pytest.raises(AssertionError):
            parse_weight(data, ["value_-10_300_2"])

    def test_quantile_rule(self):
        """quantile_<ge>_<ql>_<qh>_<scale>: quantiles over data >= ge."""
        data = np.arange(0, 101, dtype=np.float32)
        w = parse_weight(data, ["quantile_50_0.0_0.5_0.1"])
        # quantiles of data>=50 -> [50, 75]; those voxels get 0.1
        sel = (data >= 50) & (data <= 75)
        np.testing.assert_allclose(w[sel], 0.1, rtol=1e-6)
        np.testing.assert_array_equal(w[~sel], 1.0)

    def test_exp_rule(self):
        """exp_<midx>_<midv>: weight = exp(-a*data) with
        a = -ln(midv)/midx, so weight(midx) == midv."""
        data = np.array([0.0, 10.0, 20.0], np.float32)
        w = parse_weight(data, ["exp_10_0.5"])
        np.testing.assert_allclose(w, [1.0, 0.5, 0.25], rtol=1e-6)

    def test_rules_compose_in_order(self):
        data = np.array([0, 100, 200], np.float32)
        w = parse_weight(data, ["value_0_100_0.5", "value_100_200_2"])
        np.testing.assert_array_equal(w, [0.5, 2.0, 2.0])

    def test_none_rule(self):
        data = np.ones((3, 3), np.uint16)
        np.testing.assert_array_equal(parse_weight(data, ["none"]),
                                      np.ones((3, 3), np.float32))

    def test_unknown_rule_raises(self):
        with pytest.raises(NotImplementedError):
            parse_weight(np.ones(3), ["bogus_rule"])


class TestParseCheckpoints:
    def test_none(self):
        assert parse_checkpoints("none", 100) == [100]

    def test_every(self):
        assert parse_checkpoints("every_30", 100) == [30, 60, 90, 100]

    def test_every_exact_multiple(self):
        # reference range(interval, max_steps, interval) excludes max_steps
        # then appends it once
        assert parse_checkpoints("every_50", 100) == [50, 100]

    def test_int(self):
        assert parse_checkpoints(40, 100) == [40, 100]
        assert parse_checkpoints(200, 100) == [100]

    def test_explicit_list(self):
        assert parse_checkpoints("10,20,500", 100) == [10, 20, 100]


class TestPreprocess:
    def test_clip(self):
        data = np.array([0, 500, 70000], np.float32).reshape(1, 1, 3, 1)
        out = preprocess(data.copy(), 0, [2, 2, 2], [100, 60000])
        np.testing.assert_array_equal(out.ravel(), [100, 500, 60000])

    def test_denoise_level_zero_is_identity_plus_clip(self):
        data = np.random.default_rng(0).integers(
            0, 65535, (8, 8, 8, 1)).astype(np.uint16)
        out = preprocess(data.copy(), 0, [2, 2, 2], [0, 65535])
        np.testing.assert_array_equal(out, data)
