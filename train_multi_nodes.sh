#!/usr/bin/env bash
# Multi-host training launcher (counterpart of the reference's
# /root/reference/train_multi_nodes.sh, which spawned 2 nodes x 4 GPUs over
# NCCL/gloo). On TPU the same jitted program runs on every host; JAX's
# distributed runtime handles rendezvous over the coordinator address and
# GSPMD shards the batch across the global device mesh — no per-process
# rank plumbing in user code.
#
# Usage (run on EVERY host of the slice):
#   MASTER_ADDR=10.0.0.2:9876 NUM_HOSTS=2 HOST_ID=<0|1> \
#     ./train_multi_nodes.sh configs/fcos/fcos_R_50_FPN_1x.yaml [overrides...]
#
# On Cloud TPU pods, jax.distributed.initialize() auto-discovers these from
# the TPU metadata; only JAX_COORDINATOR needs to be non-empty to opt in.

set -euo pipefail

CONFIG=${1:?usage: train_multi_nodes.sh <config> [KEY VALUE ...]}
shift

export JAX_COORDINATOR="${MASTER_ADDR:-}"
if [[ -n "${MASTER_ADDR:-}" ]]; then
  export JAX_COORDINATOR_ADDRESS="$MASTER_ADDR"
  export JAX_NUM_PROCESSES="${NUM_HOSTS:-1}"
  export JAX_PROCESS_ID="${HOST_ID:-0}"
fi

exec python train_net.py --config-file "$CONFIG" "$@"
