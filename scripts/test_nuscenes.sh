#! /bin/bash
# 5-distance-split KITTI evaluation (reference scripts/test_nuscenes.sh:45-76).
# The reference fans out as 5 nohup processes pinned to GPUs; on a single
# TPU chip the splits run sequentially (the pipeline is device-bound), and
# on a multi-chip host you can fan out with JAX_DEVICE_ID pinning instead.
export DATA_PATH=${DATA_PATH:-/data/nuscenes_kitti_format}
export OUT_DIR=${OUT_DIR:?set OUT_DIR to the training run directory}
export DATASET=${DATASET:-NuscenesRandDistPairDataset}
export RANSAC=${RANSAC:-false}
export LOG_DIR=${LOG_DIR:-./ablation/nuscenes/default_test}
mkdir -p ${LOG_DIR}

range_list=(5 10 20 30 40 50)
if [ "$RANSAC" = true ]; then REGISTRATOR="ransac"; else REGISTRATOR="sc2pcr"; fi

for ((i=0; i<5; i++)); do
    min_dist=${range_list[i]}
    max_dist=${range_list[i+1]}
    python -m eyoc_tpu.cli.test \
        --nuscenes_root ${DATA_PATH} \
        --LoNUSCENES false \
        --rre_thresh 5.0 \
        --rte_thresh 2.0 \
        --pair_min_dist $min_dist \
        --pair_max_dist $max_dist \
        --use_RANSAC $RANSAC \
        --dataset $DATASET \
        --save_dir ${OUT_DIR} \
        2>&1 | tee ${LOG_DIR}/test_nuscenes_${REGISTRATOR}_${min_dist}_${max_dist}.txt
done
