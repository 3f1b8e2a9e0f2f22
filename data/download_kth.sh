#!/bin/bash
# KTH actions download (reference data/download_kth.sh contract).
#
# Two sources, same as the reference:
#   1. the denton PRE-PROCESSED 64x64 frame tar (what the reference/paper
#      actually trained on) -> $TARGET_DIR/processed/
#   2. the raw nada.kth.se videos -> $TARGET_DIR/raw/ (re-convertible with
#      dvg_tpu.data.convert, yields slightly different frames than #1)
#
# Usage: ./download_kth.sh <target_dir> [processed|raw|all]   (default: all)
set -e
TARGET_DIR=${1:?Must specify target directory}
MODE=${2:-all}

if [ "$MODE" = "processed" ] || [ "$MODE" = "all" ]; then
  # denton pre-processed 64x64 frames (reference download_kth.sh:8-11) —
  # use this for parity with the paper's training data
  mkdir -p "$TARGET_DIR/processed"
  wget http://www.cs.nyu.edu/~denton/datasets/kth.tar.gz -P "$TARGET_DIR/processed"
  tar -zxvf "$TARGET_DIR/processed/kth.tar.gz" -C "$TARGET_DIR/processed/"
  rm "$TARGET_DIR/processed/kth.tar.gz"
fi

if [ "$MODE" = "raw" ] || [ "$MODE" = "all" ]; then
  mkdir -p "$TARGET_DIR/raw"
  for c in walking jogging running handwaving handclapping boxing; do
    mkdir -p "$TARGET_DIR/raw/$c"
    wget "http://www.nada.kth.se/cvap/actions/${c}.zip" -P "$TARGET_DIR/raw"
    unzip -o "$TARGET_DIR/raw/${c}.zip" -d "$TARGET_DIR/raw/$c"
    rm "$TARGET_DIR/raw/${c}.zip"
  done
  # re-convert raw videos (only needed when not using the processed tar):
  # python -c "from dvg_tpu.data.convert import convert_videos, build_metadata; \
  #   from dvg_tpu.data.frames import KTH_CLASSES; \
  #   convert_videos('$TARGET_DIR/raw', '$TARGET_DIR', KTH_CLASSES); \
  #   build_metadata('$TARGET_DIR', KTH_CLASSES, split='train', train_fraction=0.85); \
  #   build_metadata('$TARGET_DIR', KTH_CLASSES, split='test', train_fraction=0.85)"
fi
