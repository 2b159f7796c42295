#!/usr/bin/env bash
# Adverse-weather DG evaluation driver (the reference faster_rcnn_city.sh is
# eval-only and points at a configs/City-Experiments path that does not
# exist; per SURVEY.md the intended config is AdverseWeather-Experiments).
python tools/train_net.py --eval-only \
  --config-file configs/AdverseWeather-Experiments/faster_rcnn_CLIP_R_50_C4.yaml \
  MODEL.CLIP.TEXT_EMB_PATH ./pretrained_ckpt/concept_emb/city_8_emb.pth \
  MODEL.WEIGHTS ./output/city_dg/model_final \
  OUTPUT_DIR ./output/city_dg "$@"
