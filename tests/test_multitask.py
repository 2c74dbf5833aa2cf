"""MultiTask: PRODUCT/CONCAT combinator expansion, task generation, and
in-process fleet execution (reference MultiTask.py:27-93)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess task scheduling

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.sched import multitask as mt


class TestCombinators:
    def test_plain_dict(self):
        assert mt.dict2dotlist_list({"a.b": 1, "c": "x"}) == \
            [["a.b=1", "c=x"]]

    def test_concat(self):
        out = mt.CONCAT([{"a": 1}, {"a": 2, "b": 3}])
        assert out == [["a=1"], ["a=2", "b=3"]]

    def test_product(self):
        out = mt.PRODUCT([{"a": 1}, {"CONCAT": [{"b": 1}, {"b": 2}]}])
        assert out == [["a=1", "b=1"], ["a=1", "b=2"]]

    def test_nested_product_of_concats(self):
        """2 x 2 grid (the reference default.yaml shape)."""
        out = mt.PRODUCT([
            {"CONCAT": [{"x": 1}, {"x": 2}]},
            {"CONCAT": [{"y": "u"}, {"y": "v"}]},
        ])
        assert len(out) == 4
        assert ["x=2", "y=u"] in out


def _mt_yaml(tmp_path, brain64_path, max_steps=40):
    return f"""
Dynamic:
  - PRODUCT:
      - CONCAT:
          - CompressFramework.Compress.divide.divide_type: total_2_2_2
            Log.project_name: mt_div
          - CompressFramework.Compress.divide.divide_type: none
            Log.project_name: mt_single
Static:
  Source: {{gpucost: 123, cpucost: 45}}
  Reproduc: {{seed: 42, benchmark: false, deterministic: true}}
  Dataset: {{data_path: "{brain64_path}"}}
  Log: {{outputs_dir: "{tmp_path}/outputs", project_name: mt, stdlog: false,
        tensorboard: false, time: false}}
  CompressFramework:
    Name: NFGR
    Compress:
      divide: {{divide_type: none, param_alloc: by_size,
               param_size_thres: 26, exception: none}}
      half: false
      sampler: {{name: randompoint, cube_count: 1,
                cube_len: [10000000,10000000,10000000], sample_size: 2048,
                gpu_force: true}}
      coords_mode: "-1,1"
      preprocess:
        denoise: {{level: 0, close: [2,2,2]}}
        clip: [0, 65535]
      param: {{init_net_path: none, filesize_ratio: 80, given_size: 0}}
      loss: {{name: datal2, beta: 0.01, weight: [value_65535_65535_1],
             weight_thres: 65535}}
      gpu: true
      max_steps: {max_steps}
      checkpoints: none
      loss_log_freq: 20
      lr_phi: 0.001
      optimizer_name_phi: Adamax
      lr_scheduler_phi: {{name: none}}
      decompress: true
    Decompress:
      sample_size: 4096
      gpu: true
      postprocess:
        denoise: {{level: 0, close: [2,2,2]}}
        clip: [0, 65535]
      keep_decompressed: false
      mip: false
      mse: true
      psnr: true
      ssim: false
    Module:
      phi: {{name: SIREN, coords_channel: 3, data_channel: 1, layers: 5,
            w0: 20, output_act: false, res: false}}
    Normalize: {{name: minmaxany_0_100}}
"""


def test_gen_task_list(tmp_path, brain64_path):
    yaml_path = str(tmp_path / "mt.yaml")
    with open(yaml_path, "w") as f:
        f.write(_mt_yaml(tmp_path, brain64_path))
    tasks, temp_dir = mt.gen_task_list(yaml_path)
    try:
        assert len(tasks) == 2
        assert tasks[0].gpucost == 123 and tasks[0].cpucost == 45
        # per-experiment yamls exist, Source stripped, overrides applied
        exp0 = cfglib.load(os.path.join(temp_dir, "exp_000.yaml"))
        assert "Source" not in exp0
        assert exp0.CompressFramework.Compress.divide.divide_type == \
            "total_2_2_2"
        exp1 = cfglib.load(os.path.join(temp_dir, "exp_001.yaml"))
        assert exp1.CompressFramework.Compress.divide.divide_type == "none"
    finally:
        import shutil
        shutil.rmtree(temp_dir, ignore_errors=True)


def test_multitask_end_to_end(tmp_path, brain64_path):
    """Both experiments (one DivideTask, one SingleTask) run in-process to
    completion and write their performance rows."""
    yaml_path = str(tmp_path / "mt.yaml")
    with open(yaml_path, "w") as f:
        f.write(_mt_yaml(tmp_path, brain64_path))
    queue = mt.run_multitask(yaml_path)
    assert len(queue.finish_list) == 2 and not queue.error_list
    outputs = str(tmp_path / "outputs")
    projects = sorted(os.listdir(outputs))
    assert any(p.startswith("mt_div") for p in projects)
    assert any(p.startswith("mt_single") for p in projects)
    for p in projects:
        csv = os.path.join(outputs, p, "performance.csv")
        assert os.path.exists(csv), f"missing performance.csv in {p}"
        rows = open(csv).read().strip().splitlines()
        assert len(rows) >= 2 and "psnr" in rows[0]


def test_stderr_restored_between_experiments(tmp_path):
    """MyLogger.close() must restore sys.stderr (the reference leaks the
    redirect forever, Logger.py:34-36 — improved, not replicated), so a
    MultiTask's later tracebacks do not land in an earlier run's
    stderr.log."""
    import sys
    from brief_pytorch_tpu.utils.logger import MyLogger
    before = sys.stderr
    log1 = MyLogger(project_name="a", stdlog=True, tensorboard=False,
                    outputs_dir=str(tmp_path))
    assert sys.stderr is not before
    log1.close()
    assert sys.stderr is before
    # nested runs restore in LIFO order through close()
    log2 = MyLogger(project_name="b", stdlog=True, tensorboard=False,
                    outputs_dir=str(tmp_path))
    log3 = MyLogger(project_name="c", stdlog=True, tensorboard=False,
                    outputs_dir=str(tmp_path))
    log3.close()
    log2.close()
    assert sys.stderr is before
    # double close is harmless
    log2.close()
