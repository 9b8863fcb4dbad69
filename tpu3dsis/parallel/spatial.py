"""Spatial-domain parallelism: halo-exchanged sharded 3D convolution.

The dense-conv analogue of sequence/context parallelism (SURVEY.md section
5.7): a whole-scene voxel grid is sharded along X across the device mesh;
each 3^3 convolution / max-pool exchanges one boundary slab with its mesh
neighbors over ICI (``jax.lax.ppermute``) so every shard computes exactly
the values the unsharded conv would — bit-identical outputs, X-axis memory
and FLOPs split N ways. The stride-2 k=2 downsampling convs tile exactly
(no cross-shard dependency) as long as shard sizes stay even.

This removes the reference's MAX_VOLUME=2e6 CPU fallback
(``lib/utils/config.py:123-124``, ``network.py:210-214``): scenes larger
than one chip's HBM run sharded instead of falling back to the host.

The stride-4 feature maps are small (128ch at 1/64 of the voxels), so after
the sharded backbone they are all-gathered and the RPN/proposal stages run
replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.models.nn import Bottleneck, Conv, MaxPool, Relu, conv3d


def halo_exchange(x, axis_name, halo=1):
    """Exchange `halo` X-slabs with mesh neighbors; zero-pad at grid edges.

    x: (Xl, Y, Z, C) local shard -> (Xl + 2*halo, Y, Z, C). Matches a
    zero-padded global convolution's view of the boundary.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if n == 1:
        pad = jnp.zeros((halo, *x.shape[1:]), x.dtype)
        return jnp.concatenate([pad, x, pad], axis=0)
    # send my right edge to my right neighbor (it becomes their left halo)
    right_edge = x[-halo:]
    left_halo = jax.lax.ppermute(
        right_edge, axis_name, perm=[(i, (i + 1) % n) for i in range(n)]
    )
    left_edge = x[:halo]
    right_halo = jax.lax.ppermute(
        left_edge, axis_name, perm=[(i, (i - 1) % n) for i in range(n)]
    )
    zeros = jnp.zeros_like(left_halo)
    left_halo = jnp.where(idx == 0, zeros, left_halo)
    right_halo = jnp.where(idx == n - 1, zeros, right_halo)
    return jnp.concatenate([left_halo, x, right_halo], axis=0)


def _halo_conv3(x, w, b, axis_name, compute_dtype):
    """3x3x3 pad-1 conv on an X-sharded volume (halo on X, pad on Y/Z)."""
    xh = halo_exchange(x, axis_name, halo=1)
    return conv3d(
        xh[None], w, b,
        stride=1,
        padding=[(0, 0), (1, 1), (1, 1)],
        compute_dtype=compute_dtype,
    )[0]


def _halo_maxpool3(x, axis_name):
    xh = halo_exchange(x, axis_name, halo=1)
    return jax.lax.reduce_window(
        xh,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def apply_specs_sharded(params, specs, x, axis_name, compute_dtype=jnp.float32):
    """Shard-local apply of a backbone spec list (X axis sharded).

    Supports the layer vocabulary of the shipped backbones: k=2 s=2 convs
    (no halo; shard must stay even-sized), k=3 pad-1 convs and 3x3x3
    max-pools (1-slab halo), 1x1x1 convs, Bottlenecks, ReLU.
    """
    for spec in specs:
        if isinstance(spec, Conv):
            w = params[spec.name + ".weight"]
            b = params.get(spec.name + ".bias") if spec.bias else None
            if spec.k == 3:
                x = _halo_conv3(x, w, b, axis_name, compute_dtype)
            elif spec.k == 1:
                x = conv3d(x[None], w, b, compute_dtype=compute_dtype)[0]
            else:  # k=2 s=2 tiles exactly on even shards
                assert spec.stride == spec.k, spec
                x = conv3d(
                    x[None], w, b, stride=spec.stride,
                    compute_dtype=compute_dtype,
                )[0]
        elif isinstance(spec, Relu):
            x = jax.nn.relu(x)
        elif isinstance(spec, MaxPool):
            assert spec.window == 3 and spec.stride == 1 and spec.pad == 1
            x = _halo_maxpool3(x, axis_name)
        elif isinstance(spec, Bottleneck):
            res = x
            y = conv3d(
                x[None], params[spec.name + ".conv1.weight"],
                params[spec.name + ".conv1.bias"],
                compute_dtype=compute_dtype,
            )[0]
            y = jax.nn.relu(y)
            y = _halo_conv3(
                y, params[spec.name + ".conv2.weight"],
                params[spec.name + ".conv2.bias"], axis_name, compute_dtype,
            )
            y = jax.nn.relu(y)
            y = conv3d(
                y[None], params[spec.name + ".conv3.weight"],
                params[spec.name + ".conv3.bias"],
                compute_dtype=compute_dtype,
            )[0]
            x = jax.nn.relu(y + res)
        else:
            raise TypeError(spec)
    return x


def spatial_features(detector, params, scene, mesh, axis="space",
                     imageft=None):
    """Whole-scene backbone with the X axis sharded over `mesh[axis]`.

    scene: (X, Y, Z, 2) host/global array; X must be divisible by
    4 * mesh.shape[axis] (stride-4 feature alignment). Returns the gathered
    {1: lvl1, 2: lvl2} feature maps with batch dim 1, numerically identical
    to ``detector.features`` on one device.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = mesh.shape[axis]
    assert scene.shape[0] % (4 * n) == 0, (
        f"X={scene.shape[0]} must be divisible by 4*{n}"
    )
    arch = detector.backbone
    dt = detector.cfg_static["compute_dtype"]

    def local(scene_shard, imageft_shard):
        if arch.use_images and arch.only_images:
            lvl1 = apply_specs_sharded(
                params, arch.color, imageft_shard, axis, dt
            )
        elif arch.use_images:
            c = apply_specs_sharded(params, arch.color, imageft_shard, axis, dt)
            g = apply_specs_sharded(params, arch.geometry1, scene_shard, axis, dt)
            lvl1 = jnp.concatenate([c, g], axis=-1)
        else:
            lvl1 = apply_specs_sharded(params, arch.geometry1, scene_shard, axis, dt)
        lvl2 = apply_specs_sharded(params, arch.geometry2, lvl1, axis, dt)
        # gather the small stride-4 maps for the replicated RPN stage
        lvl1 = jax.lax.all_gather(lvl1, axis, axis=0, tiled=True)
        lvl2 = jax.lax.all_gather(lvl2, axis, axis=0, tiled=True)
        return lvl1, lvl2

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis) if imageft is not None else P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if imageft is None:
        imageft_arg = jnp.zeros((0,))

        def local_geo(scene_shard, _):
            return local(scene_shard, None)

        sharded = shard_map(
            local_geo,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        lvl1, lvl2 = sharded(scene, imageft_arg)
    else:
        lvl1, lvl2 = sharded(scene, imageft)
    return {1: lvl1[None], 2: lvl2[None]}
