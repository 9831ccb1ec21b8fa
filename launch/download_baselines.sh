#!/bin/bash
# Fetch the reference's released snapshots (public visinf release;
# reference tools/download_baselines.sh).  Both the ABN baselines and the
# final SAC models load through our torch converter
# (checkpointer.load("*.pth") / infer_val.py --resume *.pth).
# Tip: run from snapshots/cityscapes/baselines.
set -e
ROOT_URL=download.visinf.tu-darmstadt.de/data/2021-cvpr-araslanov-da-sac/snapshots/baselines
for f in resnet101_gta/baseline_abn_e040.pth resnet101_gta/final_e136.pth \
         resnet101_synthia/baseline_abn_e090.pth resnet101_synthia/final_e164.pth \
         vgg16_gta/baseline_abn_e115.pth vgg16_gta/final_e184.pth \
         vgg16_synthia/baseline_abn_e070.pth vgg16_synthia/final_e164.pth \
         vgg16fcn_gta/baseline_abn_e040.pth vgg16fcn_gta/final_e112.pth \
         vgg16fcn_synthia/baseline_abn_e040.pth vgg16fcn_synthia/final_e098.pth; do
  curl "$ROOT_URL/$f" --create-dirs -o "$f"
done
