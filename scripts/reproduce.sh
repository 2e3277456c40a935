#!/usr/bin/env bash
# Reproduction scripts for the reference's headline benchmarks
# (BASELINE.md) on one TPU chip. Each run prints per-step compliance in
# the reference's log format and writes artifacts under logs/gt.
set -euo pipefail
cd "$(dirname "$0")/.."

# --- 2D MBB 300x100, V=0.3, OC 1500 iters -------------------------------
# reference: logs/slurm/gt/2dMbb300x100.log — 241.3s, final 316.48/316.02
python -m ndr_tpu.training.train_voxelfem --prob problems/2d/mbb_beam.json \
    --iter 1500 --mgl 2 --jid mbb300 --log-every 100

# --- 2D bridge 250x125, V=0.4, OC 1500 iters ----------------------------
# reference: logs/slurm/gt/2dBridge250x125.log — 246.4s, final 10.05/9.81
python -m ndr_tpu.training.train_voxelfem --prob problems/2d/bridge.json \
    --iter 1500 --mgl 2 --jid bridge250 --log-every 100

# --- 3D cantilever 256x128x128 (4.19M voxels), V=0.5, OC ----------------
# reference: logs/slurm/gt/c1001.log — 2700 iters, 7679s (~2.8 s/iter)
python -m ndr_tpu.training.train_voxelfem \
    --prob problems/3d/cantilever_flexion.json --grid "[256,128,128]" \
    --iter 2700 --mgl 5 --jid c3d_256 --log-every 100

# --- 3D bridge 320x160x80 (4.10M voxels), V=0.4, OC ---------------------
# reference: logs/slurm/gt/b1000.log — ~7.1-7.7 s/iter;
# objective trace anchor 69.588 -> 9.399 @500 -> 4.674
python -m ndr_tpu.training.train_voxelfem --prob problems/3d/bridge.json \
    --grid "[320,160,80]" --iter 1000 --mgl 4 --jid b3d_320 --log-every 100

# --- neural TO (FF-MLP 1024/512x4) on 3D bridge 64x32x16 -----------------
# reference: logs/slurm/ff/test.log — ~1.05-1.15 it/s on CPU
python -m ndr_tpu.training.train_xdg --prob problems/3d/bridge.json \
    --grid "[64,32,16]" --v0 0.4 --mgl 2 --sigma 1.0 --iter 100 \
    --vcs maxed_barrier --jid ff3d --log-every 10
