"""Hamming distance kernels for 256-bit ORB descriptors.

TPU-native replacement for the reference's per-pair popcount loop
(ref: src/ORBmatcher.cc:2353 DescriptorDistance, Thirdparty/DBoW2/FORB.cpp:85).

The TPU-shaped trick: with descriptors as {0,1} bit vectors a, b:
    popcount(a XOR b) = sum(a) + sum(b) - 2 a.b
so an entire N x M distance matrix is one matmul on the MXU (bf16 inputs are
exact for 0/1 values; f32 accumulation is exact up to 256).
A packed-u32 XOR+popcount path is kept for host-side / small cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hamming_matrix(bits_a, bits_b):
    """bits_[ab]: [N,256]/[M,256] {0,1} (any int dtype) -> [N,M] int32."""
    a = bits_a.astype(jnp.bfloat16)
    b = bits_b.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sa = jnp.sum(a.astype(jnp.float32), axis=-1)
    sb = jnp.sum(b.astype(jnp.float32), axis=-1)
    return (sa[:, None] + sb[None, :] - 2.0 * dots).astype(jnp.int32)


def popcount_u32(x):
    """Bit-twiddling popcount on uint32 arrays."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_packed(pa, pb):
    """pa [N,8] u32, pb [M,8] u32 -> [N,M] int32 via XOR+popcount."""
    x = pa[:, None, :] ^ pb[None, :, :]
    return popcount_u32(x).sum(axis=-1)


def hamming_pairs(bits_a, bits_b):
    """Rowwise distance for aligned pairs: [N,256],[N,256] -> [N] int32."""
    return jnp.sum((bits_a != bits_b).astype(jnp.int32), axis=-1)
