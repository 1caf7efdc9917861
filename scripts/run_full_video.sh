#!/bin/bash
# The reference's FULL default video workload, end-to-end on hardware:
# 13-frame / 256px HP-VAE-GAN video training at 50,000 iters per scale
# (reference train_video.py:261 default; the fps/td ladder depth follows
# the clip's aspect ratio — 10 scales on the checked-in pan clip, finest
# 13x192x257), under the stall watchdog with mid-scale checkpoints so
# outages resume instead of restarting.
#
# Usage: bash scripts/run_full_video.sh [RUN_DIR] [HOURS_BUDGET]
#   RUN_DIR       default /tmp/run_fullvid (must be dedicated to this run)
#   HOURS_BUDGET  wall-clock cap (fractional ok), default 10 — the run is
#                 checkpointed (--ckpt-interval), so a capped run is
#                 RESUMABLE: re-invoke with the same RUN_DIR and it
#                 continues where it stopped.
#
# Reduced-ladder rehearsal knobs (all default to the reference workload):
#   FV_IMG_SIZE       pyramid top size (default 256)
#   FV_NITER          iters per scale (default 50000)
#   FV_CKPT_INTERVAL  inflight-checkpoint interval (default 2000)
#   FV_STALL          watchdog stall seconds (default 900)
#   FV_DTYPE          conv compute dtype (default bfloat16 — with --fused-dg
#                     the quality-qualified headline config: SVFID parity
#                     A/B'd at 26k iters, docs/PERF.md round-3 soak; set
#                     float32 for the reference's numerics)
#   FV_FUSED          1 (default) adds --fused-dg; 0 for the split D/G step
#   FV_SMOKE=1        tiny-shape CPU dress rehearsal of the WHOLE script
#                     (probe skip, watchdog, budget expiry, resume) so the
#                     runbook's plumbing is testable in-suite without TPU
#                     time; numbers from a smoke run are meaningless.
#
# Expected: at the round-3 measured finest-3D rate (1.84 it/s sustained,
# docs/PERF.md soak) the finest scale alone is ~7.5 h; the full ladder is
# a 15-25 h job. Record per-scale close lines + incidents in docs/PERF.md;
# on completion run eval_video.py (SVFID + GIFs).
set -u
root=${1:-/tmp/run_fullvid}
hours=${2:-10}
cd "$(dirname "$0")/.."
budget_s=$(awk "BEGIN{printf \"%d\", ($hours)*3600}")

if [ "${FV_SMOKE:-0}" = "1" ]; then
    export JAX_PLATFORMS=cpu  # the rehearsal must never touch the TPU
    size_args=(--img-size "${FV_IMG_SIZE:-24}" --min-size 12 --max-size 24
               --nfc 8 --latent-dim 8 --num-layer 1 --enc-blocks 1
               --vae-levels 1 --sampling-rates 2 1 --max-frames 5)
    niter=${FV_NITER:-4}
    ckpt=${FV_CKPT_INTERVAL:-2}
    print_interval=2
    stall=${FV_STALL:-900}
else
    size_args=(--img-size "${FV_IMG_SIZE:-256}"
               --compute-dtype "${FV_DTYPE:-bfloat16}")
    [ "${FV_FUSED:-1}" = "1" ] && size_args+=(--fused-dg)
    niter=${FV_NITER:-50000}
    ckpt=${FV_CKPT_INTERVAL:-2000}
    print_interval=500
    stall=${FV_STALL:-900}
    echo "== probe transport =="
    timeout 600 python - <<'EOF' || { echo "tunnel down — not starting"; exit 1; }
import jax, jax.numpy as jnp, numpy as np
jax.devices()
x = jnp.ones((256, 256))
print("tunnel ok:", float(np.asarray((x @ x).sum())), flush=True)
EOF
fi

# balloons_pan.avi: the checked-in 24-frame eyeball-able clip (the
# reference ships no video asset); defaults give the reference's exact
# shape: 256px, 13 frames, sampling-rates 4 3 2 1. Ladder depth follows
# the clip's aspect ratio (utils/pyramid.py): this clip yields a
# 10-scale ladder, finest 13x192x257
# --foreground: keep the watchdog in THIS process group (plain timeout
# setpgid's it away, so a kill of the script's group would orphan the
# training — the exact VM-loss scenario the drill test simulates). Budget
# expiry still works: timeout TERMs the watchdog, whose trap reaps the
# training child (tests/test_watchdog.py).
timeout --foreground "$budget_s" bash scripts/train_watchdog.sh "$root" "$stall" 50 \
    python train_video.py --video-path data/vids/balloons_pan.avi \
    --checkname fullvid --run-dir "$root" --manualSeed 1 \
    --niter "$niter" --ckpt-interval "$ckpt" \
    --print-interval "$print_interval" "${size_args[@]}"
rc=$?
if [ "$rc" -eq 124 ]; then
    echo "HOURS_BUDGET reached — run is checkpointed; re-invoke to resume:"
    echo "  bash scripts/run_full_video.sh $root <more hours>"
    exit 124
fi
exit "$rc"
