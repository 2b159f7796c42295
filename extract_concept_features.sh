# Extract concept (class-name prompt) embeddings with the CLIP text tower
# (counterpart of the reference extract_concept_features.sh: encode each
# concept under the ~80 prompt templates, mean + L2-normalize, save as the
# TEXT_EMB_PATH classifier weights).

# RN50 concept embeddings
python3 ./tools/extract_concept_features.py \
--config-file ./configs/LVISv1-InstanceSegmentation/CLIP_fast_rcnn_R_50_C4_zsinf.yaml \
MODEL.WEIGHTS ./pretrained_ckpt/regionclip/regionclip_pretrained-cc_rn50.pth \
INPUT_DIR ./datasets/custom_concepts \
OUTPUT_DIR ./output/concept_feats \
MODEL.CLIP.GET_CONCEPT_EMB True
