#!/bin/bash
# BAIR robot-push raw TFRecords (reference data/download_bair.sh contract).
# Usage: ./download_bair.sh <target_dir>
TARGET_DIR=${1:-.}
mkdir -p "$TARGET_DIR"
URL=http://rail.eecs.berkeley.edu/datasets/bair_robot_pushing_dataset_v0.tar
wget "$URL" -P "$TARGET_DIR"
tar -xvf "$TARGET_DIR/bair_robot_pushing_dataset_v0.tar" -C "$TARGET_DIR"
# then: python -c "from dvg_tpu.data.convert import convert_bair; convert_bair('$TARGET_DIR/softmotion30_44k', '$TARGET_DIR', 'train'); convert_bair('$TARGET_DIR/softmotion30_44k', '$TARGET_DIR', 'test')"
