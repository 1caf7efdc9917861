#!/bin/bash
# TPU equivalent of the reference scripts/run_eval_ascend.sh.
if [ $# != 1 ] && [ $# != 2 ]; then
    echo "Usage: bash scripts/run_eval_tpu.sh EXPERIMENT_DIR [DEVICE_ID]"
    echo "DEVICE_ID is optional (default 0). For more arguments run eval_image.py directly."
    exit 1
fi
experiment_dir=$1
device_id=${2:-0}

nohup python3 eval_image.py --exp-dir "$experiment_dir" --device-id "$device_id" \
    > eval.log 2>&1 &
echo "Success! Eval started in the background; output logged to eval.log."
echo "Outputs will be stored in EXPERIMENT_DIR/eval/"
