"""Positional encoding + EncodedRes16UNet variants (reference
co3d_3d/src/models/mink/modules/encoding.py:73-218, res16unet.py:604-795).

NeRF-style sin/cos frequency features per input channel. The reference
realizes this as a fixed sparse COO matmul + phase offsets; on TPU a direct
broadcast sin/cos is one fused elementwise op. Column ordering differs from
the reference's (interleaved phases) — a fixed permutation of an untrained
featurization.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_downstream_tpu.models.mink.layers import MaskedBatchNorm, get_nonlinearity
from nerf_downstream_tpu.models.mink.res16unet import Res16UNet
from nerf_downstream_tpu.sparse import field_to_sparse, sparse_to_field
from nerf_downstream_tpu.sparse.context import CoordinateContext
from nerf_downstream_tpu.sparse.types import PointField, SparseVoxels


def encoding_frequencies(
    num_encoding_functions: int, min_resolution: Optional[float] = None
) -> np.ndarray:
    if min_resolution is not None:
        max_exp = np.log2(0.5 / min_resolution)
        return 2.0 ** np.linspace(
            max_exp - num_encoding_functions - 1, max_exp,
            num_encoding_functions,
        )
    return 2.0 ** np.arange(num_encoding_functions)


def positional_encode(
    feats: jax.Array,
    num_encoding_functions: int = 4,
    include_original_channel_range: Optional[Tuple[int, int]] = None,
    min_resolution: Optional[float] = None,
) -> jax.Array:
    """[N, C] -> [N, C * 2F (+ passthrough)]."""
    if num_encoding_functions < 1:
        return feats
    freqs = jnp.asarray(
        encoding_frequencies(num_encoding_functions, min_resolution),
        jnp.float32,
    )
    x = feats[:, :, None] * freqs[None, None, :]  # [N, C, F]
    enc = jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)
    out = enc.reshape(feats.shape[0], -1)
    if include_original_channel_range is not None:
        lo, hi = include_original_channel_range
        out = jnp.concatenate([out, feats[:, lo:hi]], axis=1)
    return out


def encoded_out_channels(
    in_channel: int,
    num_encoding_functions: int = 4,
    include_original_channel_range=None,
) -> int:
    if num_encoding_functions < 1:
        return in_channel
    extra = (
        0 if include_original_channel_range is None
        else include_original_channel_range[1] - include_original_channel_range[0]
    )
    return in_channel * 2 * num_encoding_functions + extra


class PointMLP(nn.Module):
    """Linear + BN + nonlinearity stack on point rows (the reference's
    get_mlp_block, res16unet.py:653-657)."""

    channels: Sequence[int]
    nonlinearity: str = "MinkowskiReLU"
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        non = get_nonlinearity(self.nonlinearity)
        for i, ch in enumerate(self.channels):
            feats = nn.Dense(ch, use_bias=False, name=f"mlp{i}")(feats)
            sv = SparseVoxels(
                coords=jnp.zeros((feats.shape[0], 4), jnp.int32),
                feats=feats, mask=mask, stride=1,
            )
            sv = MaskedBatchNorm(
                axis_name=self.bn_axis_name, name=f"bn{i}"
            )(sv, train)
            feats = non(sv).feats
        return feats


class EncodedRes16UNet(Res16UNet):
    """Positional-encoding MLP encoder/decoder around the UNet
    (reference res16unet.py:604-725); EncodedRes16UNet2 skips the encoder
    MLP output in the decoder concat (:727-795)."""

    enc_planes: Sequence[int] = (32, 32)
    dec_planes: Sequence[int] = (64, 64)
    num_encoding_functions: int = 4
    variant2: bool = False

    @nn.compact
    def __call__(self, field: PointField, train: bool = False):
        enc = positional_encode(field.feats, self.num_encoding_functions)
        if self.variant2:
            enc_feats = enc
        else:
            enc_feats = PointMLP(
                self.enc_planes, self.nonlinearity, self.bn_axis_name,
                name="enc_mlp",
            )(enc, field.mask, train)
        enc_field = PointField(
            coords=field.coords, feats=enc_feats, mask=field.mask
        )
        if self.variant2:
            enc_field = PointField(
                coords=field.coords,
                feats=PointMLP(
                    self.enc_planes, self.nonlinearity, self.bn_axis_name,
                    name="enc_mlp",
                )(enc, field.mask, train),
                mask=field.mask,
            )

        # run the UNet trunk on the encoded field, but take per-point
        # features before the final head
        trunk = Res16UNet(
            out_channel=self.planes[7],
            planes=self.planes,
            layers=self.layers,
            dilations=self.dilations,
            block=self.block,
            norm_type=self.norm_type,
            nonlinearity=self.nonlinearity,
            bn_momentum=self.bn_momentum,
            num_batches=self.num_batches,
            bn_axis_name=self.bn_axis_name,
            compute_dtype=self.compute_dtype,
            name="trunk",
        )
        unet_out = trunk(enc_field, train)  # [N, planes[7]]

        skip = enc if self.variant2 else enc_field.feats
        cat = jnp.concatenate([skip, unet_out], axis=1)
        dec = PointMLP(
            self.dec_planes, self.nonlinearity, self.bn_axis_name,
            name="dec_mlp",
        )(cat, field.mask, train)
        return nn.Dense(self.out_channel, use_bias=True, name="final")(dec)
