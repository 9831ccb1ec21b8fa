#!/bin/bash
# Fetch the reference's released importance-sampling weights (public
# visinf release; reference data/download_weights.sh).  Our importance
# sampler reads the torch.save format directly — or regenerate them with
#   python -m dasac_tpu.tools.compute_is_weights --labels <ABN preds on
#   train_cityscapes> --out data/cs_weights_<net>_<src>.data
set -e
ROOT_URL=download.visinf.tu-darmstadt.de/data/2021-cvpr-araslanov-da-sac/cs_weights
for f in cs_weights_resnet101_gta.data cs_weights_resnet101_synthia.data \
         cs_weights_vgg16_gta.data cs_weights_vgg16_synthia.data \
         cs_weights_vgg16fcn_gta.data cs_weights_vgg16fcn_synthia.data; do
  curl "$ROOT_URL/$f" --create-dirs -o "$f"
done
