"""Native C++ chunk decoder vs the numpy reference path."""

import numpy as np
import pytest

from tpu3dsis.io import write_chunk_file, read_chunk_file
from tpu3dsis.io.dataset import encode_tsdf, paint_mask_canvas
from tpu3dsis.runtime import decode_chunk_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def make_chunk(tmp_path, rng, dims=(12, 8, 10)):
    sdf = (rng.randn(*dims) * 3).astype(np.float32)
    boxes = np.array(
        [[1.2, 1.1, 1.3, 5.8, 4.2, 6.9], [3.0, 2.0, 2.0, 9.0, 7.0, 8.0]]
    )
    labels = np.array([5, 4], np.uint32)
    masks = []
    for b in boxes:
        shape = tuple(int(np.ceil(b[i + 3]) - np.floor(b[i])) for i in range(3))
        m = (rng.rand(*shape) * 3).astype(np.uint16)  # contains values > 1
        masks.append(m)
    path = str(tmp_path / "n.chunk")
    write_chunk_file(
        path, sdf, boxes, labels, masks, np.array([0.8, 1.0], np.float32),
        np.eye(4, dtype=np.float32) + 0.01, np.array([2, 9], np.uint32),
    )
    return path, sdf, boxes, labels, masks


def test_native_matches_numpy_path(tmp_path, rng):
    path, sdf, boxes, labels, masks = make_chunk(tmp_path, rng)
    out = decode_chunk_native(path, truncation=3.0)
    assert out is not None

    # encoded tsdf matches encode_tsdf
    from tpu3dsis.config import default_config

    cfg = default_config()
    expect = encode_tsdf(sdf, cfg)
    np.testing.assert_allclose(out["data"], expect, rtol=1e-6)

    np.testing.assert_allclose(out["boxes"], boxes.astype(np.float32))
    np.testing.assert_array_equal(out["labels"], labels)
    np.testing.assert_array_equal(out["frame_ids"], [2, 9])
    np.testing.assert_allclose(
        out["fractions"], [0.8, 1.0], rtol=1e-6
    )

    # raw world2chunk matrix round-trips (the reader inverts later)
    raw = read_chunk_file(path)
    np.testing.assert_allclose(
        np.linalg.inv(out["world2chunk_raw"].astype(np.float64)),
        raw.world_to_grid, rtol=1e-4, atol=1e-5,
    )

    # mask canvas: same as painting floor/ceil-rounded boxes in order
    import dataclasses

    from tpu3dsis.io.dataset import Sample

    gt_box = np.zeros((2, 7), np.float32)
    for i, b in enumerate(boxes):
        gt_box[i, :6] = np.concatenate(
            [np.floor(b[:3]), np.ceil(b[3:])]
        )
    sample = Sample(
        sample_id="x", data=expect, gt_box=gt_box,
        gt_mask=[np.where(m > 1, 0, m).astype(np.uint8) for m in masks],
        world_to_grid=np.eye(4, dtype=np.float32),
        frame_ids=np.array([2, 9], np.uint32),
    )
    canvas_expect = paint_mask_canvas(sample)
    np.testing.assert_array_equal(out["mask_canvas"], canvas_expect)


def test_native_flip_and_log_modes(tmp_path, rng):
    path, sdf, *_ = make_chunk(tmp_path, rng)
    from tpu3dsis.config import default_config

    cfg = default_config()
    cfg.FLIP_TSDF = True
    flip = decode_chunk_native(path, 3.0, encode_mode=1)
    np.testing.assert_allclose(
        flip["data"], encode_tsdf(sdf, cfg), rtol=1e-6
    )
    cfg.FLIP_TSDF = False
    cfg.LOG_TSDF = True
    log = decode_chunk_native(path, 3.0, encode_mode=2)
    np.testing.assert_allclose(
        log["data"], encode_tsdf(sdf, cfg), rtol=1e-5
    )


def test_native_rejects_truncated(tmp_path, rng):
    path, *_ = make_chunk(tmp_path, rng)
    blob = open(path, "rb").read()
    bad = str(tmp_path / "bad.chunk")
    open(bad, "wb").write(blob[: len(blob) // 3])
    with pytest.raises(EOFError):
        decode_chunk_native(bad, 3.0)
