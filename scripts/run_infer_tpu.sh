#!/bin/bash
# Native TPU inference pipeline (reference: scripts/run_infer_310.sh):
#   export StableHLO -> build the PJRT runner -> run -> postprocess (SIFID).
#
# Usage: bash scripts/run_infer_tpu.sh EXPERIMENT_DIR [PJRT_PLUGIN_PATH]
# PJRT_PLUGIN_PATH defaults to $PJRT_PLUGIN, then libtpu.so from the libtpu
# wheel. Extra client options for non-standard plugins can be passed via
# PJRT_CLIENT_OPTIONS="key=int:v;key=str:v".
set -e
if [ $# != 1 ] && [ $# != 2 ]; then
    echo "Usage: bash scripts/run_infer_tpu.sh EXPERIMENT_DIR [PJRT_PLUGIN_PATH]"
    exit 1
fi
exp_dir=$(realpath "$1")
repo_dir=$(realpath "$(dirname "$0")/..")

# Remote-TPU (axon) tunnel FIRST: libtpu.so needs a local TPU PCI device;
# when the chip is only reachable through an axon relay (JAX_PLATFORMS=axon),
# default to the axon PJRT plugin with the same client options the Python
# backend's registration uses (remote compile on the terminal, loopback pool
# relay). The libtpu probe must come AFTER this check — under set -e a
# missing libtpu wheel would otherwise kill the script on exactly the
# axon-only hosts this fallback exists for.
if [ -z "${2:-}" ] && [ -z "${PJRT_PLUGIN:-}" ] && [ -e /opt/axon/libaxon_pjrt.so ] \
   && [ "${JAX_PLATFORMS:-}" = "axon" ]; then
    plugin=/opt/axon/libaxon_pjrt.so
    gen=${PALLAS_AXON_TPU_GEN:-v5e}
    export AXON_COMPAT_VERSION=${AXON_COMPAT_VERSION:-49}
    export TPU_SKIP_MDS_QUERY=${TPU_SKIP_MDS_QUERY:-1}
    export TPU_WORKER_HOSTNAMES=${TPU_WORKER_HOSTNAMES:-localhost}
    export AXON_POOL_SVC_OVERRIDE=${AXON_POOL_SVC_OVERRIDE:-${PALLAS_AXON_POOL_IPS:-127.0.0.1}}
    export AXON_LOOPBACK_RELAY=${AXON_LOOPBACK_RELAY:-1}
    if [ -z "${PJRT_CLIENT_OPTIONS:-}" ]; then
        sid=$(python3 -c 'import uuid; print(uuid.uuid4())')
        PJRT_CLIENT_OPTIONS="remote_compile=int:1;local_only=int:0;priority=int:0;topology=str:${gen}:1x1x1;n_slices=int:1;session_id=str:${sid};rank=int:4294967295"
    fi
else
    plugin=${2:-${PJRT_PLUGIN:-$(python3 -c 'import libtpu, os; print(os.path.join(os.path.dirname(libtpu.__file__), "libtpu.so"))')}}
fi

# RUN_ONLY=1: skip export/build/postprocess and just execute the runner on
# an ALREADY-prepared experiment (bench.py's live serving row re-measures
# latency this way; the export and the runner binary must already exist)
if [ "${RUN_ONLY:-0}" != "1" ]; then
    echo "== export =="
    # NUM_SAMPLES=N writes N noise bins — the runner executes one inference
    # per bin and reports the averaged latency (reference main.cc loop)
    python3 "$repo_dir/export.py" --exp-dir "$exp_dir" \
        --num-samples "${NUM_SAMPLES:-1}"

    echo "== build runner =="
    bash "$repo_dir/native/pjrt_runner/build.sh" > /dev/null
fi

# NEWEST export, not the lexicographically smallest — netG_5.mlir from an
# older --netG export (or netG_10 vs netG_9) would otherwise be compiled
# against the just-rewritten io_spec/noise bins of a different scale
model=$(ls -t "$exp_dir"/infer/netG_*.mlir | head -1)
opts=()
if [ -n "$PJRT_CLIENT_OPTIONS" ]; then
    IFS=';' read -ra kv <<< "$PJRT_CLIENT_OPTIONS"
    for o in "${kv[@]}"; do opts+=("--client_option=$o"); done
fi

echo "== run =="
cd "$exp_dir"
"$repo_dir/native/pjrt_runner/out/pjrt_runner" \
    --plugin_path="$plugin" \
    --model_path="$model" \
    --compile_options_path="$exp_dir/infer/compile_options.bin" \
    --input0_path="$exp_dir/infer/noise_init" \
    --input1_path="$exp_dir/infer/noise_amps" \
    --input2_path="$exp_dir/infer/seed" \
    --output_dir="$exp_dir/infer/result" \
    "${opts[@]}"

if [ "${RUN_ONLY:-0}" = "1" ]; then
    exit 0
fi
echo "== postprocess =="
cd "$repo_dir"
python3 postprocess.py --exp-dir "$exp_dir"
