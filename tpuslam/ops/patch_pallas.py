"""Pallas TPU kernel: batched per-keypoint patch gather.

The descriptor/orientation stage needs a small square patch around every
keypoint (ref: src/ORBextractor.cc:75 IC_Angle, :106 computeOrbDescriptor —
the reference reads the patches pointer-style per keypoint on the CPU).
The alternative JAX expression, `vmap(dynamic_slice)`, lowers to a gather
through HBM; measured fetch-to-fetch on the tracking-frontend chain
(round 3, TPU v5e) the Pallas DMA path wins: full forward 1.45 ms/frame
vs 2.3+ ms with the XLA path in the mix (and the XLA-gather + fused-pose
combination compiles pathologically slowly when fused into one program).

TPU-native replacement, in two steps:

1. Pallas kernel (this file): keypoint coordinates ride in SMEM via
   scalar prefetch; each grid step issues a double-buffered async DMA
   (HBM -> VMEM) of the TILE-ALIGNED superpatch containing the keypoint's
   window. Mosaic requires HBM slice shapes aligned to the (8, 128) f32
   tiling, so the DMA fetches rows 8*(y0//8) .. +SUP_H and lanes
   128*(x0//128) .. +SUP_W; the (sub-tile) residual offsets are resolved
   in step 2.

2. XLA epilogue: the exact [size, size] window is cut out of the
   superpatch with vectorized selects — rows by 8 masked static shifts
   (oy in [0,8)), columns by a one-hot batched matmul on the MXU
   (ox in [0,128)). Both fuse into the downstream descriptor matmul
   chain; nothing lowers to a gather.

Off-TPU (CPU tests, interpret debugging) the public entry falls back to
the vmapped dynamic-slice path, which XLA:CPU handles fine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUP_H = 48   # 8-aligned rows: covers oy<8 + size<=40
SUP_W = 256  # 128-aligned lanes: covers ox<128 + size<=128
MAX_SIZE = 40


def _sup_kernel(yx_ref, img_ref, out_ref, scratch, sems):
    """Grid step c: wait superpatch c's DMA (started at step c-1, or here
    for c==0), write it out, and kick off c+1's."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    def dma(cc, slot):
        y0 = (yx_ref[cc, 0] // 8) * 8
        x0 = (yx_ref[cc, 1] // 128) * 128
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, SUP_H), pl.ds(x0, SUP_W)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()

    two = jnp.int32(2)  # literal 2 would be i64 in interpret mode under x64

    @pl.when(c + 1 < nc)
    def _():
        dma(c + 1, jax.lax.rem(c + 1, two)).start()

    slot = jax.lax.rem(c, two)
    dma(c, slot).wait()
    out_ref[0] = scratch[slot]


def _superpatches_tpu(img, yx, k: int, interpret: bool = False):
    """[k, SUP_H, SUP_W] tile-aligned superpatches via scalar-prefetch DMA."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, SUP_H, SUP_W), lambda c, yx_ref: (c, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SUP_H, SUP_W), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _sup_kernel,
        out_shape=jax.ShapeDtypeStruct((k, SUP_H, SUP_W), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(yx, img)


def _extract_patches_tpu(img, yx, size: int, interpret: bool = False):
    assert size <= MAX_SIZE, size
    k = yx.shape[0]
    yx = yx.astype(jnp.int32)
    # pad so every aligned superpatch is in bounds
    h, w = img.shape
    hp = ((h - size) // 8) * 8 + SUP_H
    wp = ((w - size) // 128) * 128 + SUP_W
    img = jnp.pad(img, ((0, max(0, hp - h)), (0, max(0, wp - w))))
    sup = _superpatches_tpu(img, yx, k, interpret=interpret)
    oy = jnp.remainder(yx[:, 0], 8)
    ox = jnp.remainder(yx[:, 1], 128)
    # rows: 8 masked static shifts (no gather)
    rows = jnp.zeros((k, size, SUP_W), img.dtype)
    for o in range(8):
        m = (oy == o).astype(img.dtype)[:, None, None]
        rows = rows + m * jax.lax.slice_in_dim(sup, o, o + size, axis=1)
    # columns: one-hot batched matmul (MXU). precision=HIGHEST keeps the
    # f32 image operand out of the default bf16 truncation so the TPU
    # path matches the XLA gather bitwise (the 0/1 weights are exact in
    # any precision; the IMAGE operand is not).
    lanes = jnp.arange(SUP_W, dtype=jnp.int32)
    cols = jnp.arange(size, dtype=jnp.int32)
    onehot = (
        lanes[None, :, None] == (ox[:, None, None] + cols[None, None, :])
    ).astype(img.dtype)
    return jnp.einsum(
        "krw,kwc->krc",
        rows,
        onehot,
        preferred_element_type=img.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _extract_patches_xla(img, yx, size: int):
    def one(p):
        return jax.lax.dynamic_slice(img, (p[0], p[1]), (size, size))

    return jax.vmap(one)(yx.astype(jnp.int32))


def on_tpu() -> bool:
    """True when the default JAX backend drives a real TPU (incl. the
    axon-tunneled chip). Explicit whitelist: unknown plugin platforms
    (METAL etc.) must NOT be routed onto the Mosaic kernel."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


def extract_patches(img, yx, size: int):
    """Gather [size,size] patches at top-left corners yx [K,2] (row, col).

    img [H,W]; every yx must satisfy 0 <= yx <= (H,W) - size. Returns
    [K, size, size] in img.dtype. TPU: scalar-prefetch DMA kernel;
    elsewhere: vmapped dynamic_slice.
    """
    if on_tpu():
        return _extract_patches_tpu(img, yx, size)
    return _extract_patches_xla(img, yx, size)
