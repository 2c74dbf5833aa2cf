#!/bin/bash
# The 512^3 headline scale scenario (RESULTS.md "512³ end-to-end"):
# adaptive octree DivideTask over the deterministic synthetic 512^3
# brain-like volume (scripts/make_scale_volume.py, seed 21), 80x, 20k
# steps, checkpoints every_10000 (two full decode->merge->eval cycles).
# Measured r5 on one v5e: 760 s end-to-end, 32.76 dB / 0.878 SSIM.
# Run on TPU from the repo root:  bash scripts/run_scale512.sh
set -eu
cd "$(dirname "$0")/.."
STEPS=${STEPS:-20000}
OUT=${OUT:-outputs/scale512}
[ -f dataset/example/brain512-0_512-0_512-0_512.tif ] || \
    python scripts/make_scale_volume.py
cfg="$(mktemp /tmp/scale512_XXXX.yaml)"
python - "$STEPS" "$OUT" "$cfg" <<'EOF'
import sys
sys.path.insert(0, ".")
from brief_pytorch_tpu.core import config as cfglib
steps, out, cfg_path = sys.argv[1:4]
opt = cfglib.load("opt/DivideTask/default.yaml")
opt.Dataset.data_path = "dataset/example/brain512-0_512-0_512-0_512.tif"
opt.CompressFramework.Compress.max_steps = int(steps)
opt.CompressFramework.Compress.checkpoints = f"every_{max(int(steps)//2,1)}"
opt.Log.outputs_dir = out
opt.Log.project_name = f"scale512_{steps}"
opt.Log.time = False
opt.Log.tensorboard = False
opt.CompressFramework.Decompress.mip = False
cfglib.save(opt, cfg_path)
EOF
t0=$(date +%s)
python -m brief_pytorch_tpu.cli.main -p "$cfg"
echo "wall_s=$(( $(date +%s) - t0 ))"
