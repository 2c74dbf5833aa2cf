"""True multi-process validation of the multi-host path: two OS processes
initialize jax.distributed over a local coordinator, build ONE mesh
spanning both processes' CPU devices, and run the data-parallel trainer's
sharded step with cross-process gradient pmean — the mechanism SURVEY.md
§2.3/§5 prescribes for multi-host TPU (the driver's dryrun covers
single-process virtual devices; this covers the actual process boundary)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # multi-process jax.distributed launches

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    from brief_pytorch_tpu.parallel.mesh import multihost_init

    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost_init(coordinator=coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    devs = np.array(jax.devices()).reshape(-1)   # global devices, both procs
    assert len(devs) == 2 * n_proc
    mesh = Mesh(devs, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    # cross-process psum: each device contributes its global index + 1
    def body(x):
        return jax.lax.psum(x, "data")

    local = np.asarray([[float(jax.process_index() * 2 + i + 1)]
                        for i in range(2)], np.float32)  # local shards
    garr = jax.make_array_from_process_local_data(sharding, local)
    out = jax.jit(shard_map(body, mesh=mesh, in_specs=P("data"),
                            out_specs=P("data")))(garr)
    total = float(np.asarray(out.addressable_data(0))[0, 0])
    expect = sum(range(1, 2 * n_proc + 1))
    assert total == expect, (total, expect)
    print(f"proc{pid} psum ok: {total}")
""")


WORKER_TRAINER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.data_parallel import DataParallelTrainer
    from brief_pytorch_tpu.parallel.mesh import multihost_init

    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost_init(coordinator=coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    devs = np.array(jax.devices()).reshape(1, -1)   # 4 global devices
    mesh = Mesh(devs, ("blocks", "data"))

    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (6, 6, 6, 1)).astype(np.float32)
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "features": 16, "layers": 4,
                      "w0": 20, "res": False})
    params = model.init(jax.random.PRNGKey(0))
    cc = cfglib.loads(\"\"\"
    sampler: {name: randompoint, cube_count: 1, cube_len: [6,6,6],
              sample_size: 64, gpu_force: true}
    loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
    half: false
    coords_mode: "-1,1"
    optimizer_name_phi: Adamax
    lr_phi: 0.001
    lr_scheduler_phi: {name: none}
    \"\"\")
    dp = DataParallelTrainer(mesh, model, seed=0)
    params, _, losses = dp.fit(params, vol, np.ones_like(vol), cc, 5)
    local = np.asarray(losses.addressable_data(0)
                       if hasattr(losses, "addressable_data") else losses)
    print("LOSSES", ",".join(f"{x:.8f}" for x in np.ravel(local)))
""")


WORKER_FLEET = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    from brief_pytorch_tpu.parallel.mesh import multihost_init

    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost_init(coordinator=coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    devs = np.array(jax.devices())   # 4 global devices across 2 processes
    mesh = Mesh(devs.reshape(-1, 1), ("blocks", "data"))

    rng = np.random.default_rng(0)
    cc = cfglib.loads(\"\"\"
    sampler: {name: randompoint, cube_count: 1, cube_len: [8,8,8],
              sample_size: 128, gpu_force: true, vector_len: 4}
    loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
    half: false
    coords_mode: "-1,1"
    optimizer_name_phi: Adamax
    lr_phi: 0.001
    lr_scheduler_phi: {name: none}
    \"\"\")
    blocks = []
    for i, f in enumerate([10, 14]):    # heterogeneous widths, one bucket
        vol = rng.uniform(0, 1, (8, 8, 8, 1)).astype(np.float32)
        blocks.append({"name": f"b{i}", "data_norm": vol,
                       "weight": np.ones_like(vol),
                       "model": init_phi({"name": "SIREN",
                                          "coords_channel": 3,
                                          "data_channel": 1, "features": f,
                                          "layers": 4, "w0": 20,
                                          "res": False}),
                       "sideinfos": {}, "weight_thres_norm": 0.0})
    trainer = BlockFleetTrainer(mesh=mesh, seed=3)
    seen = {}
    trainer.train(blocks, cc, max_steps=30, checkpoints=[30],
                  progress_cb=lambda s, l: seen.update({s: l.copy()}))
    print("FLEETLOSSES", ",".join(f"{x:.8f}" for x in seen[30]))
    # per-block true-width params come back on every process
    s0 = float(np.sum(np.abs(blocks[0]["params"]["layers"][0]["w"])))
    s1 = float(np.sum(np.abs(blocks[1]["params"]["layers"][0]["w"])))
    print(f"PARAMSUMS {s0:.8f},{s1:.8f}")
    dec = trainer.decode(blocks, cc, None)
    print("DECSUMS", ",".join(f"{float(np.abs(d).sum()):.6f}" for d in dec))
""")


WORKER_DIVIDE = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.parallel.mesh import multihost_init
    from brief_pytorch_tpu.parallel.divide_runner import compress_divide
    from brief_pytorch_tpu.utils.logger import MyLogger

    coord, n_proc, pid, yaml_path, outdir = (sys.argv[1], int(sys.argv[2]),
                                             int(sys.argv[3]), sys.argv[4],
                                             sys.argv[5])
    multihost_init(coordinator=coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    opt = cfglib.load(yaml_path)
    opt.Log.outputs_dir = outdir   # per-process dir; only pid 0 writes steps
    log = MyLogger(**opt.Log.to_plain())
    res = compress_divide(opt, log)
    print(f"LOGDIR {log.logdir}")
    print(f"SUMMARY psnr={res.get('psnr', -1):.6f}")
""")


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_compress_divide_end_to_end(tmp_path, brain64_path):
    """The FULL DivideTask pipeline (partition -> fleet training -> decode
    -> merge -> artifacts) across a real 2-process boundary: process 0
    writes the reference-layout artifacts, the decoded merged volume
    matches the single-process run (the BASELINE multi-host north star is
    a DivideTask fleet)."""
    import numpy as np
    import yaml as _yaml
    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.parallel.divide_runner import compress_divide
    from brief_pytorch_tpu.utils.logger import MyLogger

    base_yaml = f"""
Reproduc: {{seed: 42, benchmark: false, deterministic: true}}
Dataset: {{data_path: "{brain64_path}"}}
Log: {{outputs_dir: "PLACEHOLDER", project_name: mh, stdlog: false,
      tensorboard: false, time: false}}
CompressFramework:
  Name: NFGR
  Compress:
    divide: {{divide_type: total_2_2_2, param_alloc: by_size,
             param_size_thres: 26, exception: none}}
    half: false
    sampler: {{name: randompoint, cube_count: 1,
              cube_len: [10000000,10000000,10000000], sample_size: 1024,
              gpu_force: true}}
    coords_mode: "-1,1"
    preprocess:
      denoise: {{level: 0, close: [2,2,2]}}
      clip: [0, 65535]
    param: {{init_net_path: none, filesize_ratio: 80, given_size: 0}}
    loss: {{name: datal2, beta: 0.01, weight: [none], weight_thres: 0}}
    gpu: true
    max_steps: 40
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
    keep_decompressed: true
    mip: false
    mse: true
    psnr: true
    ssim: false
  Module:
    phi: {{name: SIREN, coords_channel: 3, data_channel: 1, layers: 4,
          w0: 20, output_act: false, res: false}}
  Normalize: {{name: minmaxany_0_100}}
"""
    # single-process truth on 4 virtual devices
    opt = cfglib.loads(base_yaml)
    opt.Log.outputs_dir = str(tmp_path / "single")
    log = MyLogger(**opt.Log.to_plain())
    compress_divide(opt, log)
    want = read_img(os.path.join(
        log.logdir, "steps40", "decompressed",
        os.path.basename(brain64_path).replace(".tif",
                                               "_decompressed.tif")))

    yaml_path = tmp_path / "divide.yaml"
    yaml_path.write_text(base_yaml)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_divide.py"
    script.write_text(WORKER_DIVIDE)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(pid), str(yaml_path),
         str(tmp_path / f"proc{pid}")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    # process 0 wrote the full reference-layout artifacts...
    logdir0 = [l for l in outs[0].splitlines()
               if l.startswith("LOGDIR")][0].split(" ", 1)[1]
    step = os.path.join(logdir0, "steps40")
    mods = sorted(os.listdir(os.path.join(step, "compressed", "module")))
    assert len(mods) == 8 and all(m.startswith("d_") for m in mods)
    got = read_img(os.path.join(
        step, "decompressed",
        os.path.basename(brain64_path).replace(".tif",
                                               "_decompressed.tif")))
    # ...process 1 wrote none
    logdir1 = [l for l in outs[1].splitlines()
               if l.startswith("LOGDIR")][0].split(" ", 1)[1]
    assert not os.path.isdir(os.path.join(logdir1, "steps40"))
    # and the cross-process merged volume matches single-process (uint16
    # LSB tolerance for float rounding across shard layouts)
    assert got.shape == want.shape
    assert np.max(np.abs(got.astype(np.int64) - want.astype(np.int64))) <= 1


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_block_fleet_matches_single_process(tmp_path):
    """The REAL BlockFleetTrainer (stacked masked buckets, block axis
    sharded over the mesh) runs across an actual process boundary: bucket
    placement via host_to_global, loss fetch / unstack / decode via the
    replicating all-gather.  Per-block losses, unstacked params, and
    decoded volumes must match the same 4-device single-process fleet
    (VERDICT r2 missing item 1)."""
    import numpy as np
    import jax
    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    from brief_pytorch_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    cc = cfglib.loads("""
sampler: {name: randompoint, cube_count: 1, cube_len: [8,8,8],
          sample_size: 128, gpu_force: true, vector_len: 4}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")
    blocks = []
    for i, f in enumerate([10, 14]):
        vol = rng.uniform(0, 1, (8, 8, 8, 1)).astype(np.float32)
        blocks.append({"name": f"b{i}", "data_norm": vol,
                       "weight": np.ones_like(vol),
                       "model": init_phi({"name": "SIREN",
                                          "coords_channel": 3,
                                          "data_channel": 1, "features": f,
                                          "layers": 4, "w0": 20,
                                          "res": False}),
                       "sideinfos": {}, "weight_thres_norm": 0.0})
    mesh = make_mesh(n_block_shards=4, n_data_shards=1,
                     devices=jax.devices()[:4])
    trainer = BlockFleetTrainer(mesh=mesh, seed=3)
    seen = {}
    trainer.train(blocks, cc, max_steps=30, checkpoints=[30],
                  progress_cb=lambda s, l: seen.update({s: l.copy()}))
    want_losses = seen[30]
    want_sums = [float(np.sum(np.abs(b["params"]["layers"][0]["w"])))
                 for b in blocks]
    want_dec = [float(np.abs(d).sum())
                for d in trainer.decode(blocks, cc, None)]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_fleet.py"
    script.write_text(WORKER_FLEET)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    import numpy as np
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        lv = [l for l in out.splitlines() if l.startswith("FLEETLOSSES")][0]
        got = np.asarray([float(x) for x in lv.split()[1].split(",")])
        np.testing.assert_allclose(got, want_losses, atol=1e-5,
                                   err_msg=f"proc{pid} fleet losses diverged")
        pv = [l for l in out.splitlines() if l.startswith("PARAMSUMS")][0]
        got_sums = [float(x) for x in pv.split()[1].split(",")]
        np.testing.assert_allclose(got_sums, want_sums, rtol=1e-5,
                                   err_msg=f"proc{pid} unstacked params "
                                           "diverged")
        dv = [l for l in out.splitlines() if l.startswith("DECSUMS")][0]
        got_dec = [float(x) for x in dv.split()[1].split(",")]
        np.testing.assert_allclose(got_dec, want_dec, rtol=1e-4,
                                   err_msg=f"proc{pid} decode diverged")


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_dp_trainer_matches_single_process(tmp_path):
    """The REAL DataParallelTrainer step (shard_map + pmean gradient
    reduction, parallel/data_parallel.py) runs across an actual process
    boundary; its per-step loss trace must equal the same 4-device training
    run inside one process — the cross-host program is mathematically
    identical to the single-host one (VERDICT r1 weak item 1)."""
    # single-process truth on 4 of the parent's virtual devices
    import numpy as np
    import jax
    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.data_parallel import DataParallelTrainer
    from brief_pytorch_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (6, 6, 6, 1)).astype(np.float32)
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "features": 16, "layers": 4,
                      "w0": 20, "res": False})
    params = model.init(jax.random.PRNGKey(0))
    cc = cfglib.loads("""
sampler: {name: randompoint, cube_count: 1, cube_len: [6,6,6],
          sample_size: 64, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")
    mesh = make_mesh(n_block_shards=1, n_data_shards=4,
                     devices=jax.devices()[:4])
    dp = DataParallelTrainer(mesh, model, seed=0)
    _, _, want = dp.fit(params, vol, np.ones_like(vol), cc, 5)
    want = np.ravel(np.asarray(want))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_trainer.py"
    script.write_text(WORKER_TRAINER)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        got = np.asarray([float(x) for x in line.split()[1].split(",")])
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"proc{pid} loss trace diverged")


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_mesh_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-2000:]}"
        assert "psum ok: 10.0" in out


WORKER_CLI = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    from brief_pytorch_tpu.cli.main import main

    coord, pid, yaml_path = sys.argv[1], sys.argv[2], sys.argv[3]
    res = main(["-p", yaml_path, "-coordinator", coord,
                "-nprocs", "2", "-procid", pid])
    print(f"SUMMARY psnr={res.get('psnr', float('nan')):.4f}")
""")


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cli_divide(tmp_path, brain64_path):
    """Multi-host launch through the USER-FACING CLI flags (-coordinator /
    -nprocs / -procid, cli/main.py): each process runs the same command,
    joins one jax.distributed mesh, the DivideTask fleet spans both, and
    only process 0 writes the reference-layout artifacts (the reference
    spanned machines via per-block subprocesses + a shared filesystem,
    main.py:547-580)."""
    base_yaml = """
Reproduc: {{seed: 42, benchmark: false, deterministic: true}}
Dataset: {{data_path: "{data}"}}
Log: {{outputs_dir: "{out}", project_name: clidist, stdlog: false,
      tensorboard: false, time: false}}
CompressFramework:
  Name: NFGR
  Compress:
    divide: {{divide_type: total_2_2_2, param_alloc: by_size,
             param_size_thres: 26, exception: none}}
    half: false
    sampler: {{name: randompoint, cube_count: 1,
              cube_len: [10000000,10000000,10000000], sample_size: 1024,
              gpu_force: true}}
    coords_mode: "-1,1"
    preprocess:
      denoise: {{level: 0, close: [2,2,2]}}
      clip: [0, 65535]
    param: {{init_net_path: none, filesize_ratio: 80, given_size: 0}}
    loss: {{name: datal2, beta: 0.01, weight: [none], weight_thres: 0}}
    gpu: true
    max_steps: 40
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
    keep_decompressed: true
    mip: false
    mse: true
    psnr: true
    ssim: false
  Module:
    phi: {{name: SIREN, coords_channel: 3, data_channel: 1, layers: 4,
          w0: 20, output_act: false, res: false}}
  Normalize: {{name: minmaxany_0_100}}
"""
    yamls = []
    for pid in range(2):
        y = tmp_path / f"divide_p{pid}.yaml"
        y.write_text(base_yaml.format(data=brain64_path,
                                      out=str(tmp_path / f"proc{pid}")))
        yamls.append(y)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_cli.py"
    script.write_text(WORKER_CLI)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid), str(yamls[pid])],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    # process 0 wrote the artifacts under ITS outputs dir
    logdir0 = os.path.join(tmp_path, "proc0", "clidist")
    mods = sorted(os.listdir(os.path.join(logdir0, "steps40",
                                          "compressed", "module")))
    assert len(mods) == 8 and all(m.startswith("d_") for m in mods)
    psnr0 = float([l for l in outs[0].splitlines()
                   if l.startswith("SUMMARY")][0].split("=")[1])
    assert psnr0 > 15.0, psnr0
    # process 1 wrote none
    logdir1 = os.path.join(tmp_path, "proc1", "clidist")
    assert not os.path.isdir(os.path.join(logdir1, "steps40"))


WORKER_FLEET_RESUME = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    from brief_pytorch_tpu.parallel.mesh import multihost_init

    coord, n_proc, pid, shared = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    multihost_init(coordinator=coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    devs = np.array(jax.devices())   # 4 global devices across 2 processes
    mesh = Mesh(devs.reshape(-1, 1), ("blocks", "data"))

    cc = cfglib.loads(\"\"\"
    sampler: {name: randompoint, cube_count: 1, cube_len: [8,8,8],
              sample_size: 128, gpu_force: true, vector_len: 4}
    loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
    half: false
    coords_mode: "-1,1"
    optimizer_name_phi: Adamax
    lr_phi: 0.001
    lr_scheduler_phi: {name: none}
    \"\"\")

    def build_blocks():
        rng = np.random.default_rng(0)
        blocks = []
        cfgs = [{"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                 "features": 10, "layers": 4, "w0": 20, "res": False},
                {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                 "features": 14, "layers": 4, "w0": 20, "res": False},
                # MFN solo: trains redundantly per process; its state must
                # round-trip through the fleet state file too
                {"name": "MFNGabor", "coords_channel": 3,
                 "data_channel": 1, "features": 8, "layers": 4}]
        for i, cfg in enumerate(cfgs):
            vol = rng.uniform(0, 1, (8, 8, 8, 1)).astype(np.float32)
            blocks.append({"name": f"b{i}", "data_norm": vol,
                           "weight": np.ones_like(vol),
                           "model": init_phi(cfg), "sideinfos": {},
                           "weight_thres_norm": 0.0})
        return blocks

    state = os.path.join(shared, "fleet_state.npz")
    # A: stop at 15 — proc 0 writes the state (the save's all-gathers are
    # collective; the file write is process-0-gated)
    ta = BlockFleetTrainer(mesh=mesh, seed=3)
    ta.train(build_blocks(), cc, max_steps=30, checkpoints=[15],
             state_path=state)
    # B: uninterrupted cross-process truth
    bb = BlockFleetTrainer(mesh=mesh, seed=3).train(
        build_blocks(), cc, max_steps=30, checkpoints=[15, 30])
    # C: resume across the SAME 2-process boundary
    bc = BlockFleetTrainer(mesh=mesh, seed=3).train(
        build_blocks(), cc, max_steps=30, checkpoints=[15, 30],
        resume_path=state)
    for blk_b, blk_c in zip(bb, bc):
        lb = jax.tree_util.tree_leaves(blk_b["params"])
        lc = jax.tree_util.tree_leaves(blk_c["params"])
        assert len(lb) == len(lc)
        for x, y in zip(lb, lc):
            assert np.array_equal(np.asarray(x), np.asarray(y)), \\
                blk_b["name"]
    print(f"proc{pid} RESUME OK")
""")


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_fleet_resume(tmp_path):
    """Fleet checkpoint/resume across a real 2-process boundary: the state
    save all-gathers sharded bucket stacks (collective, process-0 write),
    the resume re-places them via host_to_global, and the resumed fleet is
    bit-identical to the uninterrupted cross-process run."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_fleet_resume.py"
    script.write_text(WORKER_FLEET_RESUME)
    shared = tmp_path / "shared"
    shared.mkdir()
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(pid), str(shared)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} RESUME OK" in out


WORKER_FLEET_4PROC = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    from brief_pytorch_tpu.parallel.mesh import multihost_init

    coord, n_proc, pid, shared = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    multihost_init(coordinator=coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    devs = np.array(jax.devices())   # 4 global devices, 1 per process
    assert len(devs) == 4
    mesh = Mesh(devs.reshape(-1, 1), ("blocks", "data"))

    cc = cfglib.loads(\"\"\"
    sampler: {name: randompoint, cube_count: 1, cube_len: [8,8,8],
              sample_size: 128, gpu_force: true, vector_len: 4}
    loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
    half: false
    coords_mode: "-1,1"
    optimizer_name_phi: Adamax
    lr_phi: 0.001
    lr_scheduler_phi: {name: none}
    \"\"\")

    def build_blocks():
        # uneven on purpose (VERDICT r3 next #6): bucket A (SIREN L=4) has
        # 2 blocks < 4 processes -> _prepare_bucket pads 2->4 with every
        # process addressing at most one real block; bucket B (SIREN L=5)
        # has 5 blocks, not divisible by 4 -> pads 5->8; plus one MFN solo
        # block trained redundantly per process.
        rng = np.random.default_rng(0)
        cfgs = [{"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                 "features": 10, "layers": 4, "w0": 20, "res": False},
                {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                 "features": 14, "layers": 4, "w0": 20, "res": False}]
        cfgs += [{"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                  "features": 10 + 2 * i, "layers": 5, "w0": 20,
                  "res": False} for i in range(5)]
        cfgs.append({"name": "MFNGabor", "coords_channel": 3,
                     "data_channel": 1, "features": 8, "layers": 4})
        blocks = []
        for i, cfg in enumerate(cfgs):
            shp = (8, 8, 8, 1) if i % 2 == 0 else (8, 6, 8, 1)
            vol = rng.uniform(0, 1, shp).astype(np.float32)
            blocks.append({"name": f"b{i}", "data_norm": vol,
                           "weight": np.ones_like(vol),
                           "model": init_phi(cfg), "sideinfos": {},
                           "weight_thres_norm": 0.0})
        return blocks

    state = os.path.join(shared, "fleet_state.npz")
    # A: stop at 15, process-0-gated state write
    BlockFleetTrainer(mesh=mesh, seed=3).train(
        build_blocks(), cc, max_steps=30, checkpoints=[15],
        state_path=state)
    # B: uninterrupted 4-process truth
    bb = BlockFleetTrainer(mesh=mesh, seed=3).train(
        build_blocks(), cc, max_steps=30, checkpoints=[15, 30])
    # C: resume across the same 4-process boundary
    bc = BlockFleetTrainer(mesh=mesh, seed=3).train(
        build_blocks(), cc, max_steps=30, checkpoints=[15, 30],
        resume_path=state)
    for blk_b, blk_c in zip(bb, bc):
        lb = jax.tree_util.tree_leaves(blk_b["params"])
        lc = jax.tree_util.tree_leaves(blk_c["params"])
        assert len(lb) == len(lc)
        for x, y in zip(lb, lc):
            assert np.array_equal(np.asarray(x), np.asarray(y)), \\
                blk_b["name"]
    sums = ",".join(
        f"{float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(b['params']))):.6f}"
        for b in bb)
    print(f"proc{pid} 4PROC OK {sums}")
""")


@pytest.mark.skipif(os.environ.get("BRIEF_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_four_process_fleet_uneven_buckets_resume(tmp_path):
    """4-process fleet with uneven buckets (a 2-block bucket smaller than
    the process count, a 5-block bucket not divisible by it, an MFN solo
    block) plus mid-run resume: catches divisibility/addressability edges
    in _prepare_bucket's block-axis padding that 2-process tests cannot
    (block_trainer.py target rounding), and every process must agree on
    the final per-block params (VERDICT r3 next #6)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_fleet_4proc.py"
    script.write_text(WORKER_FLEET_4PROC)
    shared = tmp_path / "shared"
    shared.mkdir()
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "4", str(pid), str(shared)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(4)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    sums = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines()
                if l.startswith(f"proc{pid} 4PROC OK")][0]
        sums.append(line.split()[-1])
    # all four processes computed identical per-block params
    assert len(set(sums)) == 1, sums
