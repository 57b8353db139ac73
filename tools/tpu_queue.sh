#!/bin/sh
# Queued on-chip work, in priority order — run when the axon tunnel is back.
# Each step is independently useful; stop anywhere. See NOTES_NEXT_ROUND.md
# for the full context of each item.
set -x

# 0. Tunnel sanity (seconds)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. Deform-gather A/B: pair-table (2KB rows) vs flat 4-tap. Start SMALL.
#    On a >=1.3x pair win at C=256: wire _gather_bilinear_pair_batched into
#    deform_sample_batched (ops/deform_conv.py) and rerun step 3.
timeout 900 python tools/gather_probe.py --batch 1 --reps 4
timeout 1800 python tools/gather_probe.py --batch 8 --reps 8

# 2. Head level-packing A/B (TPU.PACK_HEAD_LEVELS): expect a win if the
#    P5-P7 dispatch overhead dominates; wire default-on only on a win.
timeout 1800 python tools/headpack_probe.py --batch 32 --reps 16

# 3. Family predict benches (RepPoints expected <=15 ms/img with the pair
#    gather; Faster R-CNN / CornerNet numbers still unrecorded).
timeout 2400 python tools/family_predict_bench.py \
    configs/rep-points/rep_points_detector_R_50_FPN_1x.yaml
timeout 2400 python tools/family_predict_bench.py \
    configs/faster/faster_rcnn_R_50_FPN_1x.yaml --batch 1
timeout 2400 python tools/family_predict_bench.py \
    configs/corner/corner_net_hourglass.yaml --batch 4 --size 512 768

# 4. Headline bench (the driver also runs this at round end).
timeout 3600 python bench.py
