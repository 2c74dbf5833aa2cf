#!/bin/bash
# Demo-config runs at depth (VERDICT r3 missing #3): hipct + neuron
# DivideTask demos at STEPS (default 20k; reference demos specify 80k,
# /root/reference/opt/DivideTask/hipct.yaml:30).  Volumes are synthetic
# stand-ins (scripts/make_demo_volume.py — the reference's demo volumes
# are git-LFS blobs absent from the snapshot).  Run on TPU from the repo
# root:  bash scripts/run_demos.sh
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-20000}
OUT=${OUT:-outputs/demo_r4}
mkdir -p "$OUT"
python scripts/make_demo_volume.py
for demo in hipct neuron; do
  cfg="$OUT/${demo}_${STEPS}.yaml"
  python - "$demo" "$STEPS" "$OUT" "$cfg" <<'EOF'
import sys
sys.path.insert(0, ".")
from brief_pytorch_tpu.core import config as cfglib
demo, steps, out, cfg_path = sys.argv[1:5]
opt = cfglib.load(f"opt/DivideTask/{demo}.yaml")
opt.CompressFramework.Compress.max_steps = int(steps)
opt.CompressFramework.Compress.checkpoints = f"every_{max(int(steps)//4, 1)}"
opt.Log.outputs_dir = out
opt.Log.project_name = f"{demo}_{steps}"
opt.Log.time = False
opt.Log.tensorboard = False
cfglib.save(opt, cfg_path)
EOF
  echo "=== $demo $STEPS steps ==="
  timeout 7200 python -m brief_pytorch_tpu.cli.main -p "$cfg" \
      || echo "RUN FAILED: $demo"
  tail -2 "$OUT/${demo}_${STEPS}"/performance.csv 2>/dev/null
done
