"""Config system: attribute-dict config with strict YAML overlay.

Preserves the public YAML schema of the reference's ``experiments/cfgs/**``
(see reference ``lib/utils/config.py:12-248`` for the key inventory and
``config.py:250-298`` for the strict-merge semantics: unknown keys raise
KeyError, type mismatches raise ValueError). Unlike the reference, the config
is NOT a process-global singleton — it is an explicit value threaded through
the pipeline, which keeps jitted functions pure and hashable-static.
"""

from __future__ import annotations

import copy
import csv

import yaml


class Config(dict):
    """A dict with attribute access (replacement for easydict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    @staticmethod
    def deep(d):
        """Recursively convert nested dicts into Config."""
        if isinstance(d, dict):
            return Config({k: Config.deep(v) for k, v in d.items()})
        if isinstance(d, list):
            return [Config.deep(v) for v in d]
        return d

    def copy(self):
        return Config.deep(copy.deepcopy(dict(self)))


def default_config() -> Config:
    """All hyperparameters with reference defaults (``lib/utils/config.py``)."""
    c = Config()

    # --- Optimizer (config.py:16-36) ---
    c.LEARNING_RATE = 0.001
    c.MOMENTUM = 0.9
    c.WEIGHT_DECAY = 0.0005
    c.GAMMA = 0.1
    c.STEPSIZE = [30000]
    c.DISPLAY = 10
    c.DOUBLE_BIAS = True
    c.INIT_TRUNCATED = True
    c.BIAS_DECAY = False

    # --- RPN (config.py:38-54) ---
    c.RPN_POSITIVE_OVERLAP = 0.6
    c.RPN_NEGATIVE_OVERLAP = 0.2
    c.RPN_FG_FRACTION = 0.5
    c.RPN_BATCHSIZE = 256
    c.ALLOW_BORDER = 0
    c.FIRST_TIME_ANCHORS = True
    c.RPN_CHANNELS = 256

    # --- NMS (config.py:56-73) ---
    c.TRAIN = Config()
    c.TRAIN.RPN_NMS_THRESH = 0.7
    c.TRAIN.RPN_PRE_NMS_TOP_N = 12000
    c.TRAIN.RPN_POST_NMS_TOP_N = 2000
    c.TEST = Config()
    c.TEST.RPN_NMS_THRESH = 0.35
    c.TEST.RPN_PRE_NMS_TOP_N = 6000
    c.TEST.RPN_POST_NMS_TOP_N = 300

    # --- Classification (config.py:75-92) ---
    c.CLASS_BATCH_SIZE = 128
    c.FG_FRACTION = 0.25
    c.FG_THRESH = 0.3
    c.BG_THRESH = 0.2
    c.BG_THRESH_LO = 0.2
    c.USE_GT = True
    c.NORMALIZE_WEIGHTS = 1.0
    c.CLASS_POOLING_SIZE = 2

    # --- Mask (config.py:94-102) ---
    c.MASK_FG_THRESH = 0.5
    c.MASK_USE_IMAGES = False
    c.MASK_ONLY_IMAGES = False

    # --- Checkpoints (config.py:104-111) ---
    c.VAL_TIME = 2.0
    c.SNAPSHOT_KEPT = 3
    c.VAL_NUM = 20
    c.VAL_SAVE_DIR = ""
    c.TEST_SAVE_DIR = ""

    # --- Evaluation (config.py:114-124) ---
    c.MAP_THRESH = 0.25
    c.ROI_THRESH = 0.9
    c.CLASS_THRESH = 0.9
    c.MASK_THRESH = 0.5
    c.MODE = ""
    c.MAX_IMAGE = 400
    c.MAX_VOLUME = 2000000

    # --- Dataloader (config.py:126-141) ---
    c.NUM_CLASSES = 0
    c.BATCH_SIZE = 1
    c.TRAIN_FILELIST = ""
    c.VAL_FILELIST = ""
    c.TEST_FILELIST = ""
    c.TRAINVAL_FILELIST = ""
    c.KEEP_THRESH = 0.0
    c.LABEL_MAP = "datagen/fileLists/nyu40labels.csv"
    c.VOXEL_SIZE = 0.09375
    c.TRUNCATED = 3.0
    c.FLIP_TSDF = False
    c.LOG_TSDF = False

    # --- Anchors (config.py:143-154) ---
    c.NUM_ANCHORS_LEVEL1 = 9
    c.NUM_ANCHORS_LEVEL2 = 9
    c.NUM_ANCHORS_LEVEL3 = 9
    c.ANCHORS_TYPE_LEVEL1 = "suncg"
    c.ANCHORS_TYPE_LEVEL2 = "suncg"
    c.ANCHORS_TYPE_LEVEL3 = "suncg"
    c.FILTER_ANCHOR_LEVEL1 = ""
    c.FILTER_ANCHOR_LEVEL2 = ""
    c.FILTER_ANCHOR_LEVEL3 = ""

    # --- Nets (config.py:156-180) ---
    c.LOAD_BACKBONE = False
    c.USE_BACKBONE = False
    c.FIX_BACKBONE = False
    c.LOAD_RPN = False
    c.USE_RPN = False
    c.FIX_RPN = False
    c.LOAD_CLASS = False
    c.USE_CLASS = False
    c.FIX_CLASS = False
    c.USE_MASK = True
    c.FIX_ENET = True
    c.NET = "overfitting_net"
    c.MASK_BACKBONE = ""

    # --- Color pipeline (config.py:182-219) ---
    c.USE_IMAGES = False
    c.ONLY_IMAGES = False
    c.USE_IMAGES_GT = True
    c.NUM_2D_CLASSES = 41
    c.NUM_IMAGES = 1
    c.RANDOM_NUM_IMAGES = False
    c.BASE_IMAGE_PATH = "/mnt/local_datasets/SUNCG/suncg_frames"
    c.PRETRAINED_ENET_PATH = ""
    c.IMAGE_SHAPE = [328, 256]
    c.PROJ_DEPTH_MIN = 0.1
    c.PROJ_DEPTH_MAX = 4.0
    c.IMAGE_TYPE = "color2"
    c.IMAGE_EXT = ".jpg"
    c.DEPTH_SHAPE = [41, 32]
    c.NUM_IMAGE_CHANNELS = 128
    c.INTRINSIC = [
        [35.5070229, 0, 20, 0],
        [0, 36.9504013, 15.5, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ]
    c.COLOR_MEAN = [0.47083, 0.44685, 0.40733]
    c.COLOR_STD = [0.27861, 0.27409, 0.28844]

    # --- NYUv2 (config.py:244-247) ---
    c.NYUV2_FINETUNE = False

    # --- tpu3dsis extensions (not in the reference schema; all prefixed TPU_
    # so reference YAMLs never collide) ---
    c.DEBUG = False
    # max gt boxes per sample after fixed-shape padding
    c.TPU_MAX_GT = 64
    # compute dtype for conv backbones: 'float32' or 'bfloat16'
    c.TPU_COMPUTE_DTYPE = "float32"
    # data-parallel mesh axis size (0 = use all local devices)
    c.TPU_DATA_PARALLEL = 0
    # canonical mask-head crop canvas (static shape for jit); 0,0,0 = chunk dims
    c.TPU_MASK_CANVAS = [96, 48, 96]
    # whole-scene tiling: chunk size + halo overlap in voxels.
    # stride = tile - longest per-axis anchor extent (53, 39, 53 voxels,
    # experiments/anchors/scannet14_11.txt): every anchor-sized object lies
    # fully inside at least one tile on every axis (round-1 stride 48 only
    # guaranteed 48 and could miss 2.5 m sofas straddling every tile). The
    # y stride only matters for scenes taller than 48 voxels (benchmark
    # mode); test-mode scenes are height-cropped to 48 = one y tile.
    c.TPU_TILE_SIZE = [96, 48, 96]
    c.TPU_TILE_STRIDE = [43, 9, 43]
    # cross-tile dedup NMS threshold (stitching)
    c.TPU_STITCH_NMS_THRESH = 0.25
    # whole-scene inference mask-FCN crop canvas (halo windows keep masks
    # exact for boxes of any size, ops/mask_windows.py) and the small-box
    # fast-path canvas: boxes fitting it run the FCN on ~6x fewer voxels
    # (exact — the region re-mask makes the FCN canvas-size independent).
    # Set the small canvas equal to the canvas to disable bucketing.
    c.TPU_MASK_INFER_CANVAS = [64, 48, 64]
    c.TPU_MASK_INFER_CANVAS_SMALL = [32, 32, 32]
    # fused one-dispatch scene inference (infer/tiling.py::infer): device
    # queue capacities. PRE_NMS bounds boxes entering the stitch NMS,
    # MAX_DETECTIONS the kept boxes, LARGE_WINDOWS the halo-window queue for
    # boxes bigger than the small canvas. Overflow is counted on device and
    # reconciled through the exact host-planned path (never silent).
    c.TPU_FUSED_PRE_NMS = 1024
    c.TPU_FUSED_MAX_DETECTIONS = 64
    c.TPU_FUSED_LARGE_WINDOWS = 12
    # mask-training roi capacity per sample
    c.TPU_MAX_MASK_ROIS = 16
    # opt-in small-canvas fast queue for mask TRAINING (0s = off): rois
    # fitting [sx, sy, sz] run the region-masked FCN on a small canvas
    # (exact); the TPU_MASK_CANVAS queue then only carries
    # TPU_MAX_LARGE_MASK_ROIS oversize rois (overflow counted in the
    # mask_windows_dropped metric, never silent)
    c.TPU_MASK_CANVAS_SMALL = [0, 0, 0]
    c.TPU_MAX_LARGE_MASK_ROIS = 16
    # spare work-queue slots for halo-windows of rois larger than the mask
    # canvas (ops/mask_windows.py); 0 degrades oversize rois gracefully
    c.TPU_MASK_EXTRA_WINDOWS = 4
    # max views fused per tile in whole-scene color inference (only used by
    # the per-tile fallback path — see TPU_SCENE_COLOR_RESIDENT)
    c.TPU_MAX_TILE_VIEWS = 16
    # whole-scene color inference: 'auto' builds a scene-resident projected
    # color volume ONCE per scene (every view fused, exact reference
    # semantics — lib/nets/network.py:220-235 — no per-tile view cap) when
    # it fits TPU_COLOR_VOLUME_MAX_MB of HBM, and tiles/mask windows slice
    # from it; 'never' forces the per-tile frustum-selected re-projection
    # (TPU_MAX_TILE_VIEWS cap); 'always' errors if over budget.
    c.TPU_SCENE_COLOR_RESIDENT = "auto"
    c.TPU_COLOR_VOLUME_MAX_MB = 2048
    # views max-fused per scan step when building the resident color volume
    # (value-exact for any K — max is associative). Default 1: on v5e the
    # blocked scan LOST (953 ms -> 1833 ms at K=4, 90-view 192x48x192
    # build) — vmapping the per-view gather materializes K full volumes in
    # HBM before the block max, costing more than the carry RMW it saves.
    c.TPU_COLOR_VIEWS_PER_STEP = 1
    # lax.scan unroll factor for the resident-volume view scan: XLA
    # overlaps/fuses consecutive view steps — measured 622 -> 472 ms for the
    # 90-view 172x48x172 build on v5e at 8, bit-exact
    # (tools/exp_volume_scan2.py); 16 measured no better than 8
    c.TPU_COLOR_SCAN_UNROLL = 8
    # whole-scene inference mode: 'tiled' (production) or 'single_shot'
    # (reference-style one pass, for parity experiments)
    c.TPU_SCENE_MODE = "tiled"
    # devices to spread tile batches over at scene inference (shard_map,
    # scene replicated); 0/1 = single device
    c.TPU_SCENE_TILE_PARALLEL = 0
    # compact host->device transfers: binary mask canvas as uint8 (exact),
    # raw uint8 color images normalized on device (exact: same fp32 ops),
    # TSDF data in bfloat16 when TPU_COMPUTE_DTYPE is bfloat16 (identical to
    # the on-device cast the first conv performs anyway). Training steps are
    # transfer-bound on tunnel-attached chips (BENCH_NOTES.md).
    c.TPU_COMPACT_TRANSFERS = True

    return c


def merge_into(overlay: dict, base: Config) -> None:
    """Strict merge of ``overlay`` into ``base`` in place.

    Mirrors reference ``_merge_a_into_b`` (``lib/utils/config.py:250-285``):
    unknown keys raise KeyError; type mismatches raise ValueError, except
    int->float promotion for float defaults (yaml parses `1` as int).
    """
    if not isinstance(overlay, dict):
        return
    for k, v in overlay.items():
        if k not in base:
            raise KeyError("{} is not a valid config key".format(k))
        old = base[k]
        if isinstance(old, dict):
            if not isinstance(v, dict):
                raise ValueError(
                    "Type mismatch ({} vs. {}) for config key: {}".format(
                        type(old), type(v), k
                    )
                )
            merge_into(v, old)
            continue
        if old is not None and v is not None and type(old) is not type(v):
            if isinstance(old, float) and isinstance(v, int):
                v = float(v)
            elif isinstance(old, bool) and isinstance(v, int):
                v = bool(v)
            elif isinstance(old, list) and isinstance(v, list):
                pass
            else:
                raise ValueError(
                    "Type mismatch ({} vs. {}) for config key: {}".format(
                        type(old), type(v), k
                    )
                )
        base[k] = v


def cfg_from_file(filename: str, base: Config | None = None) -> Config:
    """Load a YAML overlay onto the defaults and return the merged Config."""
    cfg = base if base is not None else default_config()
    with open(filename, "r") as f:
        overlay = yaml.safe_load(f)
    if overlay:
        merge_into(overlay, cfg)
    return cfg


def cfg_to_file(cfg: Config, filename: str) -> None:
    with open(filename, "w") as f:
        yaml.safe_dump({k: _plain(v) for k, v in cfg.items()}, f)


def _plain(v):
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v


def load_label_mapping(label_file: str):
    """Parse the label-map CSV -> (nyu40id->consecutive-id map, class weights).

    Mirrors reference ``Dataset.load_mapping`` (``lib/datasets/dataset.py:268-283``):
    CSV schema `nyu40id,nyu40class,mappedId,mappedIdConsecutive,weight`; the
    background weight 0.3280746813009404 is prepended; weight-0 rows map to the
    ignore bucket.
    """
    mapping = {}
    weights_pre = {}
    weights = [0.3280746813009404]
    with open(label_file) as csvfile:
        for row in csv.DictReader(csvfile, delimiter=","):
            mapping[int(row["nyu40id"])] = int(row["mappedIdConsecutive"])
            weights_pre[int(row["mappedIdConsecutive"])] = float(row["weight"])
    for key in sorted(weights_pre.keys()):
        weights.append(weights_pre[key])
    return mapping, weights


def finalize_config(cfg: Config) -> Config:
    """Derive NUM_CLASSES / NORMALIZE_WEIGHTS from the label map.

    Mirrors reference ``main.py:44-50``: NORMALIZE_WEIGHTS keeps only
    weights > 0 (bg + instance classes); NUM_CLASSES is their count.
    """
    if cfg.LABEL_MAP:
        _, weights = load_label_mapping(cfg.LABEL_MAP)
        cfg.NORMALIZE_WEIGHTS = [w for w in weights if w > 0]
        cfg.NUM_CLASSES = len(cfg.NORMALIZE_WEIGHTS)
    return cfg
