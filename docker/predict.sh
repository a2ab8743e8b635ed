#!/bin/sh
# Challenge submission entry point (reference baseline/predict.sh parity):
# read ./inputs, write ./outputs/{name}_label.tiff
python -m cellseg_tpu.cli.predict -i ./inputs -o ./outputs \
    --model_path ./work_dir/unet_3class --input_size 256
