"""Microbench the RoI-pool variants on the real TPU at pipeline shapes.

Round-2 perf item (BENCH_NOTES): stage-1 of the masked reduction does P=4
redundant passes per axis; candidates are the one-pass segment decomposition
and the select-level-then-pool-once multilevel dispatch. Times with the
scan-amortized pattern (axon tunnel lies otherwise) and verifies every
variant bit-matches the reference semantics first.
"""

import os
import sys
import pathlib
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd

import numpy as np  # noqa: E402


def device_time(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    def repeated(*a):
        def body(carry, _):
            r = fn(*a[:-1], a[-1] + carry * 1e-20)
            return jnp.asarray(r, jnp.float32).ravel()[0], ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    g = jax.jit(repeated)
    float(g(*args))
    t0 = time.perf_counter()
    float(g(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from tpu3dsis.ops.roi_pool3d import (
        roi_pool3d,
        roi_pool3d_multilevel,
        roi_pool3d_reference,
        roi_pool3d_segmented,
    )

    rng = np.random.RandomState(0)
    # pipeline shapes: stride-4 features of a 96x48x96 chunk, 200 TEST rois
    shape = (24, 12, 24, 128)
    n_rois = 200
    feat = rng.randn(*shape).astype(np.float32)
    rois = np.zeros((n_rois, 6), np.float32)
    lo = rng.randint(0, 90, (n_rois, 3))
    sz = rng.randint(2, 50, (n_rois, 3))
    rois[:, :3] = lo
    rois[:, 3:] = np.minimum(lo + sz, [96, 48, 96])
    level_inds = rng.randint(1, 3, n_rois).astype(np.int32)

    f = jnp.asarray(feat)
    r = jnp.asarray(rois)

    # exactness first
    want = np.asarray(roi_pool3d_reference(f, r, 4, 0.25))
    for name, fn in (
        ("masked", roi_pool3d),
        ("segmented", roi_pool3d_segmented),
    ):
        got = np.asarray(fn(f, r, 4, 0.25))
        np.testing.assert_array_equal(got, want, err_msg=name)
    feats2 = (f, jnp.asarray(rng.randn(*shape).astype(np.float32)))
    want_ml = np.where(
        (level_inds == 1)[:, None, None, None, None],
        np.asarray(roi_pool3d_reference(feats2[0], r, 4, 0.25)),
        np.asarray(roi_pool3d_reference(feats2[1], r, 4, 0.25)),
    )
    got_ml = np.asarray(
        roi_pool3d_multilevel(feats2, r, jnp.asarray(level_inds), 4, (0.25, 0.25))
    )
    np.testing.assert_array_equal(got_ml, want_ml, err_msg="multilevel-select")
    print("exactness: all variants identical")

    results = {}
    for name, fn in (
        ("masked_f32", lambda f_, r_: roi_pool3d(f_, r_, 4, 0.25)),
        ("segmented_f32", lambda f_, r_: roi_pool3d_segmented(f_, r_, 4, 0.25)),
    ):
        results[name] = device_time(fn, f, r) * 1e3
    fb = f.astype(jnp.bfloat16)
    results["masked_bf16"] = device_time(
        lambda f_, r_: roi_pool3d(f_, r_, 4, 0.25), fb, r
    ) * 1e3
    results["segmented_bf16"] = device_time(
        lambda f_, r_: roi_pool3d_segmented(f_, r_, 4, 0.25), fb, r
    ) * 1e3

    # two-level dispatch: old pool-both-and-select vs new select-then-pool
    def ml_old(f1, f2, r_):
        a = roi_pool3d(f1, r_, 4, 0.25)
        b = roi_pool3d(f2, r_, 4, 0.25)
        sel = (jnp.asarray(level_inds) == 2)[:, None, None, None, None]
        return jnp.where(sel, b, a)

    def ml_new(f1, f2, r_):
        return roi_pool3d_multilevel(
            (f1, f2), r_, jnp.asarray(level_inds), 4, (0.25, 0.25)
        )

    results["ml_pool_both_f32"] = device_time(ml_old, feats2[0], feats2[1], r) * 1e3
    results["ml_select_f32"] = device_time(ml_new, feats2[0], feats2[1], r) * 1e3
    f2b = tuple(x.astype(jnp.bfloat16) for x in feats2)
    results["ml_pool_both_bf16"] = device_time(ml_old, f2b[0], f2b[1], r) * 1e3
    results["ml_select_bf16"] = device_time(ml_new, f2b[0], f2b[1], r) * 1e3

    for k, v in results.items():
        print(f"{k:22s} {v:8.3f} ms / {n_rois} rois")


if __name__ == "__main__":
    main()
