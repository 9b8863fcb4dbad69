"""Drive the tpu3dsis library end-to-end through its public API:
synthetic .chunk on disk -> SceneDataset -> jitted Detector inference."""
import os, time
# CPU by default (SMOKE_PLATFORM=axon to drive the real chip): the session
# environment pins JAX_PLATFORMS=axon, a remote TPU tunnel that can stall —
# this smoke test must always be runnable.
os.environ["JAX_PLATFORMS"] = os.environ.get("SMOKE_PLATFORM", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import pathlib, sys; os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd

import numpy as np
import jax, jax.numpy as jnp
# The env var alone is overridden by the axon TPU plugin; jax.config wins
# (same forcing as tests/conftest.py) — without it this smoke test hangs on
# a stalled tunnel instead of running on CPU.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
from tpu3dsis.utils.cache import enable_compilation_cache
enable_compilation_cache()

from tpu3dsis.config import default_config, cfg_from_file, finalize_config
from tpu3dsis.io import write_chunk_file, SceneDataset, pad_sample
from tpu3dsis.models import Detector, build_inference_fn

# --- 1. config through the public YAML loader, reference schema ---
cfg = cfg_from_file("experiments/cfgs/ScanNet/benchmark.yml")
cfg.LABEL_MAP = "experiments/labelmaps/nyu40labels_scannet.csv"
finalize_config(cfg)
cfg.USE_IMAGES = False  # geometry-only slice (driver config #1)
cfg.NUM_IMAGE_CHANNELS = 128
print("cfg loaded: NUM_CLASSES =", cfg.NUM_CLASSES, "NET =", cfg.NET)

# --- 2. synthetic chunk on disk, loaded via dataset ---
rng = np.random.RandomState(7)
sdf = rng.randn(96, 48, 96).astype(np.float32) * 3
boxes = np.array([[10, 5, 10, 30, 25, 30], [50, 2, 40, 70, 20, 60]], np.float64)
labels = np.array([5, 4], np.uint32)
masks = [np.ones((20, 20, 20), np.uint16), np.ones((20, 18, 20), np.uint16)]
os.makedirs("/tmp/vdata", exist_ok=True)
write_chunk_file("/tmp/vdata/s.chunk", sdf, boxes, labels, masks,
                 np.ones(2, np.float32), np.eye(4, dtype=np.float32),
                 np.zeros(0, np.uint32))
open("/tmp/vdata/list.txt", "w").write("/tmp/vdata/s.chunk\n")
ds = SceneDataset("/tmp/vdata/list.txt", "chunk", cfg)
sample = ds[0]
print("sample: data", sample.data.shape, "gt", sample.gt_box.shape)
padded = pad_sample(sample, cfg)

# --- 3. jitted inference on the chunk ---
det = Detector(cfg, anchor_dir="experiments/anchors")
params = det.init_params(jax.random.PRNGKey(0))
print("params:", len(params), "tensors,",
      sum(int(np.prod(v.shape)) for v in params.values()), "weights")
infer = jax.jit(build_inference_fn(det, cfg, (96, 48, 96), mode="TEST"))
scene = jnp.asarray(padded["data"])[None]
t0 = time.time()
out = jax.block_until_ready(infer(params, scene))
t1 = time.time()
out2 = jax.block_until_ready(infer(params, scene))
t2 = time.time()
print(f"compile+run {t1-t0:.1f}s, cached run {t2-t1:.3f}s")
for k in ("rois", "scores", "level_inds", "valid", "cls_prob", "pred_box", "pred_conf"):
    print(f"  {k}: {out[k].shape} {out[k].dtype}")
nv = int(out["valid"].sum())
print("valid proposals:", nv, "of", out["valid"].shape[0])
print("top-3 rois:\n", np.asarray(out["rois"][:3]))
print("pred classes (first 5):", np.asarray(out["cls_pred"][:5]))
assert nv > 0, "no proposals survived NMS"
assert np.isfinite(np.asarray(out["pred_box"])).all()

# --- probe: malformed cfg key through the YAML loader ---
import tempfile
bad = tempfile.NamedTemporaryFile("w", suffix=".yml", delete=False)
bad.write("LEARNING_RATE: 0.1\nNO_SUCH_KEY: 3\n")
bad.close()
try:
    cfg_from_file(bad.name)
    print("PROBE FAIL: unknown key accepted")
except KeyError as e:
    print("probe ok: unknown key rejected ->", e)

# --- probe: truncated chunk file ---
with open("/tmp/vdata/s.chunk", "rb") as f:
    blob = f.read()
with open("/tmp/vdata/trunc.chunk", "wb") as f:
    f.write(blob[: len(blob) // 2])
from tpu3dsis.io import read_chunk_file
try:
    read_chunk_file("/tmp/vdata/trunc.chunk")
    print("PROBE FAIL: truncated file accepted")
except EOFError as e:
    print("probe ok: truncated file rejected ->", e)
print("DONE")
