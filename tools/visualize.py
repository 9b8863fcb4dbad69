"""CLI: PLY visualization of .chunk data or saved prediction results.

Modes (reference tools/visualization.py:340-505):
  data:   --chunk <file.chunk> --out <dir> [--cfg <yml>]
  result: --result_dir <TEST_SAVE_DIR/scene> --out <dir>
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["data", "result"], required=True)
    p.add_argument("--chunk")
    p.add_argument("--result_dir")
    p.add_argument("--out", required=True)
    p.add_argument("--cfg", default=None)
    args = p.parse_args()

    from tpu3dsis.tools.visualization import visualize_chunk, visualize_result

    if args.mode == "data":
        from tpu3dsis.config import cfg_from_file, default_config

        cfg = cfg_from_file(args.cfg) if args.cfg else default_config()
        visualize_chunk(args.chunk, args.out, cfg)
    else:
        visualize_result(args.result_dir, args.out)


if __name__ == "__main__":
    main()
