#!/bin/bash
# Run inference + export on a split:
#   SNAPSHOT_PATH=... bash launch/infer_val.sh [cfg-name] [filelist]
# e.g.
#   SNAPSHOT_PATH=snapshots/.../epoch123_score52.ckpt \
#     bash launch/infer_val.sh deeplabv2_resnet101_train val_cityscapes
set -e

CFG_NAME=${1:-deeplabv2_resnet101_train}
FILELIST=${2:-val_cityscapes}
OUTPUT_DIR=${OUTPUT_DIR:-./results}
DATALOADER=${DATALOADER:-cityscapes}
SCALES=${SCALES:-1.0}
FLIP_FLAG=${FLIP:+--flip}
# BATCH=N -> N images per step (above the chip count = several per chip,
# the serving throughput dial; PARITY.md)
BATCH_FLAG=${BATCH:+--batch $BATCH}
# SPATIAL=1 -> all chips per frame (bare flag); SPATIAL=N>1 -> combined
# (devices/N, N) mesh with N chips per frame
SPATIAL_FLAG=""
if [ -n "${SPATIAL:-}" ]; then
  if [ "$SPATIAL" = "1" ]; then
    SPATIAL_FLAG="--spatial"
  else
    SPATIAL_FLAG="--spatial $SPATIAL"
  fi
fi

if [ -z "$SNAPSHOT_PATH" ] || [ ! -f "$SNAPSHOT_PATH" ]; then
  echo "[E] set SNAPSHOT_PATH to a .ckpt or reference .pth snapshot"
  exit 1
fi

SAVE_ID=$(basename "$SNAPSHOT_PATH" | sed 's/\.[^.]*$//')
SAVE_DIR=$OUTPUT_DIR/$DATALOADER/$SAVE_ID/$FILELIST
LOG_FILE=$SAVE_DIR.log
mkdir -p "$SAVE_DIR"

CMD="python infer_val.py --cfg configs/${CFG_NAME}.yaml \
  --dataloader $DATALOADER --resume $SNAPSHOT_PATH \
  --infer-list data/${FILELIST}.txt --mask-output-dir $SAVE_DIR \
  --scales $SCALES $FLIP_FLAG $BATCH_FLAG $SPATIAL_FLAG"
echo "$CMD"
if [ -n "${DASAC_DRYRUN:-}" ]; then
  # test hook: print the dispatched command without launching
  exit 0
fi
$CMD 2>&1 | tee "$LOG_FILE"
