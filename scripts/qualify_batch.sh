#!/bin/bash
# Batch>1 training qualification (docs/PERF.md known-headroom #4):
# quality + wall-clock A/B of batch-8 variants against the batch-1 default
# on the reference's full image workload (10 scales x 5000 iters, 256px —
# reference hot loop train_image.py:154-159 trains batch 1).
#
# Runs (same seed; the training CLIs' stock f32 config so ONLY the batch
# lever varies — the bf16+fused-dg bench levers were qualified separately):
#   b1      batch 1, 5000 iters/scale  (control = reference default)
#   b8      batch 8, 5000 iters/scale  (8x gradient samples per step:
#           does averaging over 8 noise draws help or hurt SIFID?)
#   b8fast  batch 8,  625 iters/scale  (same TOTAL gradient-sample count
#           as b1 — the wall-clock lever, if quality holds)
#
# Each run is evaluated (50 samples, on-device SIFID — the round-3
# methodology) and compared to b1 via scripts/compare_runs.py. Judge the
# deltas against the MEASURED seed-to-seed noise floor (PERF.md round 3:
# amps deviate up to 9.6%, SIFID 4.6% between seeds): a lever whose
# deviation sits inside the seed envelope is quality-neutral.
#
# Usage: bash scripts/qualify_batch.sh [RUN_ROOT]   (default /tmp/run_qb)
# Expected TPU time: b1 ~25 min, b8 ~60-90 min, b8fast ~10 min, evals
# ~5 min each. Emits a summary block to append to docs/PERF.md.
set -eo pipefail
root=${1:-/tmp/run_qb}
cd "$(dirname "$0")/.."
img=data/imgs/air_balloons.jpg

# QB_SMOKE=1: tiny-shape CPU dress rehearsal of the full pipeline (train x3,
# eval x3, compare) so plumbing bugs never cost TPU time. Numbers from a
# smoke run are meaningless — qualification requires the real workload.
if [ "${QB_SMOKE:-0}" = "1" ]; then
    export JAX_PLATFORMS=cpu  # the rehearsal must never touch (or wedge on) the TPU
    iters_full=6; iters_fast=2
    size_args=(--img-size 36 --min-size 18 --max-size 36 --nfc 8
               --latent-dim 8 --num-layer 1 --enc-blocks 1 --vae-levels 1)
    eval_args=(--num-samples 4 --max-samples 2)
    last_scale=$(python - <<'EOF'
from hpvaegan_tpu.config import Config
cfg = Config(image_path="data/imgs/air_balloons.jpg", img_size=36,
             min_size=18, max_size=36).finalize()
print(cfg.stop_scale)
EOF
)
else
    iters_full=5000; iters_fast=625
    size_args=()
    eval_args=(--num-samples 50 --max-samples 4)
    last_scale=9
    echo "== probe transport =="
    timeout 600 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
jax.devices()
x = jnp.ones((256, 256))
print("tunnel ok:", float(np.asarray((x @ x).sum())), flush=True)
EOF
fi

exp_of() {  # name -> newest experiment dir (a watchdog restart resumes
    # into a NEW auto-incremented experiment_<n>; results live in the newest)
    ls -td "$root/$1/air_balloons/$1"/experiment_* 2>/dev/null | head -1
}

train_one() {  # name batch niter
    # each run gets a DEDICATED run dir: the watchdog resumes from the
    # newest intermediate.json under its run dir, so sharing one root
    # across runs would resume the wrong experiment
    local name=$1 batch=$2 niter=$3
    if [ -f "$(exp_of "$name")/netG_${last_scale}.ckpt" ]; then
        echo "== $name already trained, skipping =="
        return
    fi
    echo "== train $name (batch $batch, $niter iters/scale) =="
    bash scripts/train_watchdog.sh "$root/$name" 900 2 \
        python train_image.py --image-path "$img" --checkname "$name" \
        --run-dir "$root/$name" --manualSeed 1 --batch-size "$batch" \
        --niter "$niter" --ckpt-interval 1000 --print-interval 1000 \
        "${size_args[@]}"
}

eval_one() {  # name
    local exp; exp=$(exp_of "$1")
    if [ -f "$exp/eval/metrics.json" ]; then
        echo "== $1 already evaluated, skipping =="
        return
    fi
    echo "== eval $1 (on-device SIFID) =="
    timeout 1800 python eval_image.py --exp-dir "$exp" \
        --on-device-fid "${eval_args[@]}"
}

train_one b1 1 "$iters_full"
train_one b8 8 "$iters_full"
train_one b8fast 8 "$iters_fast"
eval_one b1
eval_one b8
eval_one b8fast

echo
echo "== A/B vs the batch-1 control =="
a=$(exp_of b1)
for v in b8 b8fast; do
    echo "---- b1 vs $v ----"
    python scripts/compare_runs.py "$a" "$(exp_of "$v")" \
        || true
done
echo
echo "Summary for docs/PERF.md: wall clocks are the 'scale K done' sums in"
echo "each logbook.txt; SIFIDs in each eval/metrics.json. Judge vs the"
echo "seed floor (amps <=9.6%, SIFID <=4.6%)."
