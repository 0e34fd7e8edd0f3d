#! /bin/bash
# Supervised FCGF training on waymo
# Published hyperparameters mirrored from the reference launcher
# (reference scripts/train_waymo.sh).
export PATH_POSTFIX=$1
export MISC_ARGS=$2

export DATA_ROOT=${DATA_ROOT:-./outputs/Experiments}
export DATASET=${DATASET:-WaymoRandDistPairDataset}
export TRAINER=${TRAINER:-HardestContrastiveLossTrainer}
export MODEL=${MODEL:-ResUNetBN2C}
export MODEL_N_OUT=${MODEL_N_OUT:-32}
export OPTIMIZER=${OPTIMIZER:-SGD}
export LR=${LR:-5e-3}
export WEIGHT_DECAY=${WEIGHT_DECAY:-1e-4}
export MAX_EPOCH=${MAX_EPOCH:-200}
export BATCH_SIZE=${BATCH_SIZE:-8}
export ITER_SIZE=${ITER_SIZE:-1}
export VOXEL_SIZE=${VOXEL_SIZE:-0.3}
export CONV1_KERNEL_SIZE=${CONV1_KERNEL_SIZE:-5}
export EXP_GAMMA=${EXP_GAMMA:-0.98}
export RANDOM_SCALE=${RANDOM_SCALE:-True}
export DATA_PATH=${DATA_PATH:-/data/waymo_kitti_format}
export TIME=$(date +"%Y-%m-%d_%H-%M-%S")
export OUT_DIR=${DATA_ROOT}/${DATASET}-v${VOXEL_SIZE}/${TRAINER}/${MODEL}/${OPTIMIZER}-lr${LR}-e${MAX_EPOCH}-b${BATCH_SIZE}i${ITER_SIZE}-modelnout${MODEL_N_OUT}${PATH_POSTFIX}/${TIME}
export PYTHONUNBUFFERED="True"

echo $OUT_DIR
mkdir -p $OUT_DIR
LOG=${OUT_DIR}/log_${TIME}.txt
echo "Host: " $(hostname) | tee -a $LOG

python -m eyoc_tpu.cli.train \
	--dataset ${DATASET} \
	--trainer ${TRAINER} \
	--model ${MODEL} \
	--model_n_out ${MODEL_N_OUT} \
	--conv1_kernel_size ${CONV1_KERNEL_SIZE} \
	--optimizer ${OPTIMIZER} \
	--lr ${LR} \
	--batch_size ${BATCH_SIZE} \
	--iter_size ${ITER_SIZE} \
	--max_epoch ${MAX_EPOCH} \
	--voxel_size ${VOXEL_SIZE} \
	--out_dir ${OUT_DIR} \
	--use_random_scale ${RANDOM_SCALE} \
	--positive_pair_search_voxel_size_multiplier 1.5 \
	--kitti_root ${DATA_PATH} \
	--hit_ratio_thresh 0.3 \
	--exp_gamma ${EXP_GAMMA} \
	--pair_min_dist 5 \
	--pair_max_dist 20 \
	${MISC_ARGS} 2>&1 | tee -a $LOG
