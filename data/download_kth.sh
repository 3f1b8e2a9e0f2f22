#!/bin/bash
# KTH actions raw videos (reference data/download_kth.sh contract).
# Usage: ./download_kth.sh <target_dir>
TARGET_DIR=${1:-.}
mkdir -p "$TARGET_DIR/raw"
for c in walking jogging running handwaving handclapping boxing; do
  mkdir -p "$TARGET_DIR/raw/$c"
  wget "http://www.nada.kth.se/cvap/actions/${c}.zip" -P "$TARGET_DIR/raw"
  unzip -o "$TARGET_DIR/raw/${c}.zip" -d "$TARGET_DIR/raw/$c"
done
# then: python -c "from dvg_tpu.data.convert import convert_videos, build_metadata; from dvg_tpu.data.frames import KTH_CLASSES; convert_videos('$TARGET_DIR/raw', '$TARGET_DIR', KTH_CLASSES); build_metadata('$TARGET_DIR', KTH_CLASSES, split='train', train_fraction=0.85); build_metadata('$TARGET_DIR', KTH_CLASSES, split='test', train_fraction=0.85)"
