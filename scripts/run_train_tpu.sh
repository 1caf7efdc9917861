#!/bin/bash
# TPU equivalent of the reference scripts/run_train_ascend.sh: launch image
# training in the background on the default TPU device.
if [ $# != 1 ] && [ $# != 2 ]; then
    echo "Usage: bash scripts/run_train_tpu.sh IMAGE_PATH [DEVICE_ID]"
    echo "DEVICE_ID is optional (default 0). For more arguments run train_image.py directly."
    exit 1
fi
image_path=$1
device_id=${2:-0}

nohup python3 train_image.py --image-path "$image_path" --checkname image \
    --device-id "$device_id" > train.log 2>&1 &
echo "Success! Training started in the background; output logged to train.log."
echo "Artifacts will be stored in ./run/<image>/image/experiment_*/"
