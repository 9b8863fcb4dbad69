#!/bin/bash
# Golden-path demo (the reference example.sh equivalent).
#
# With real data: place the example scene + checkpoints as in the reference
# layout and run the three stages below. Without data/network, `--synthetic`
# generates a scene with the datagen pipeline and runs the full flow on it.
set -e

if [ "$1" == "--synthetic" ]; then
  python tools/demo.py --out example_result
  exit 0
fi

# 1. whole-scene inference on the example scene (artifacts into
#    example_result/test/<scene>/: pred_box.npy, pred_mask, scene.npy, ...)
python main.py --cfg ScanNet/example --mode benchmark \
    --output_dir example_result/ckpt --step "$CHECKPOINT"

# 2. voxel predictions -> ScanNet benchmark mesh-vertex format
python tools/vox2mesh.py --pred_dir example_result/test \
    --output_dir example_result/benchmark \
    --scan_path "$SCANS" --frames "$FRAMES"

# 3. visualize + evaluate
python tools/visualize.py --mode result \
    --result_dir example_result/test/$(ls example_result/test | head -1) \
    --out example_result/vis
python tools/evaluate_benchmark.py --pred_path example_result/benchmark \
    --gt_path "$GT_PATH"
