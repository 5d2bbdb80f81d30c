#!/bin/bash
# Round-4 RealSN-DnCNN training: the missing sigma=40 checkpoint (the
# reference lists RealSN_DnCNN_noise40.pth in .MISSING_LARGE_BLOBS — its own
# blob is absent upstream; this trains the framework's own). Same recipe as
# round 3 (train_realsn_round3.sh): lip=0.3, mode S, 20 epochs.
set -u
cd /root/repo
EPOCHS=20
MILESTONE=13
NOISE=40
EXP=checkpoints/exp_realsn_noise${NOISE}
EXPORT=realsn_dncnn_noise${NOISE}
for ATTEMPT in 1 2 3 4 5 6; do
  echo "=== noiseL=${NOISE} attempt ${ATTEMPT} $(date) ==="
  timeout 3600 python examples/train_realsn.py \
    --exp "${EXP}" --layers 17 --features 64 --lip 0.3 \
    --mode S --noiseL "${NOISE}" \
    --epochs ${EPOCHS} --milestone ${MILESTONE} \
    --export "${EXPORT}"
  RC=$?
  if [ ${RC} -eq 0 ]; then
    echo "=== noiseL=${NOISE} DONE $(date) ==="
    python - "$EXP" "$EXPORT" <<'PYEOF'
import json, sys
from pathlib import Path
exp, export = sys.argv[1], sys.argv[2]
recs = [json.loads(l) for l in open(Path(exp) / "scalars.jsonl")]
last = recs[-1]
out = Path("checkpoints") / f"{export}.val.json"
out.write_text(json.dumps({
    "val_psnr_db": last["val_psnr"], "val_ssim": last["val_ssim"],
    "epochs": last["epoch"] + 1, "lip": 0.3,
    "val_set": "Set12 (reference training val set)",
}, indent=1))
print("wrote", out)
PYEOF
    break
  fi
  echo "=== attempt ${ATTEMPT} failed rc=${RC}; retrying after 120s ==="
  sleep 120
done
echo "=== training done $(date) ==="
