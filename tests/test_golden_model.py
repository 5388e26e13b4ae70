"""Model-level golden parity: full Res16UNet14 vs an INDEPENDENT torch
dense implementation of MinkowskiEngine conv/BN semantics.

The reference's model semantics live in MinkowskiEngine (not installable
here). This file re-derives them densely over a small voxel grid in torch
(~150 LoC): a submanifold k3/s1 conv is a masked dense conv, a k2/s2 down
conv is a strided dense conv + occupancy max-pool, the k2 transpose conv is
conv_transpose3d masked to the cached finer occupancy, BN normalizes
occupied sites with torch running-stat semantics. Weights live in ME's
[K, Cin, Cout] x-fastest kernel layout, so the SAME state_dict drives the
torch reference and (via train/torch_import.py) the flax model.

Asserted: flax logits == torch logits (<=1e-3) for every conv path (row /
block_resident / window), through a genuine Lightning-format checkpoint
round trip (reference key space: conv0p1s1.0.kernel, block1.0.norm1.bn.*).

Reference semantics: co3d_3d/src/models/mink/modules/common.py:73-180,
res16unet.py:236-435.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_downstream_tpu import config as cfg  # noqa: E402

E = 16  # grid extent (stride-16 bottom level = 1 cell)
B = 2
CIN = 6
NCLS = 13
PLANES = (32, 48, 64, 96, 96, 96, 64, 64)


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


class MEConv(tnn.Module):
    """ME-layout conv param [K, Cin, Cout]; dense masked-grid forward."""

    def __init__(self, cin, cout, k, rng, flat1x1=False):
        super().__init__()
        kk = k ** 3
        w = torch.tensor(
            rng.normal(size=(kk, cin, cout)).astype(np.float32)
            * (2.0 / (kk * cin)) ** 0.5
        )
        # ME stores kernel-volume-1 convs as 2D [Cin, Cout]
        self.kernel = tnn.Parameter(w[0] if flat1x1 else w)
        self.k = k
        self.cin, self.cout = cin, cout
        self.bias = None

    def _dense_w(self):
        k = self.k
        kern = self.kernel if self.kernel.dim() == 3 else self.kernel[None]
        # kernel_offsets enumerates x fastest -> reshape [z, y, x, ci, co];
        # torch conv3d weight is [co, ci, d0, d1, d2] over our (x, y, z) dims
        return kern.reshape(k, k, k, self.cin, self.cout).permute(
            4, 3, 2, 1, 0
        )

    def forward(self, x, occ):
        if self.k == 1:
            w = self.kernel if self.kernel.dim() == 2 else self.kernel[0]
            y = torch.einsum("bcxyz,cd->bdxyz", x, w)
        elif self.k == 3:  # submanifold: same coords, missing neighbors = 0
            y = F.conv3d(x, self._dense_w(), padding=1)
        else:
            raise ValueError(self.k)
        if self.bias is not None:
            y = y + self.bias.reshape(1, -1, 1, 1, 1)
        return y * occ


class MEConvDown2(MEConv):
    def __init__(self, cin, cout, rng):
        tnn.Module.__init__(self)
        w = torch.tensor(
            rng.normal(size=(8, cin, cout)).astype(np.float32)
            * (2.0 / (8 * cin)) ** 0.5
        )
        self.kernel = tnn.Parameter(w)
        self.k = 2
        self.cin, self.cout = cin, cout
        self.bias = None

    def forward(self, x, occ_out):
        return F.conv3d(x, self._dense_w(), stride=2) * occ_out


class MEConvUp2(MEConvDown2):
    def forward(self, x, occ_fine):
        k = self.kernel.reshape(2, 2, 2, self.cin, self.cout)
        w = k.permute(3, 4, 2, 1, 0)  # [ci, co, x, y, z]
        return F.conv_transpose3d(x, w, stride=2) * occ_fine


class MEBN(tnn.Module):
    """ME MinkowskiBatchNorm wraps torch BN as ``.bn`` (eval semantics:
    running stats applied to occupied sites)."""

    def __init__(self, c, rng):
        super().__init__()
        self.bn = tnn.BatchNorm1d(c)
        with torch.no_grad():
            self.bn.weight.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, c).astype(np.float32)))
            self.bn.bias.copy_(torch.tensor(
                rng.normal(size=c).astype(np.float32) * 0.1))
            self.bn.running_mean.copy_(torch.tensor(
                rng.normal(size=c).astype(np.float32) * 0.1))
            self.bn.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 2.0, c).astype(np.float32)))

    def forward(self, x, occ):
        m = self.bn.running_mean.reshape(1, -1, 1, 1, 1)
        v = self.bn.running_var.reshape(1, -1, 1, 1, 1)
        w = self.bn.weight.reshape(1, -1, 1, 1, 1)
        b = self.bn.bias.reshape(1, -1, 1, 1, 1)
        return ((x - m) * torch.rsqrt(v + self.bn.eps) * w + b) * occ


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, planes, rng):
        super().__init__()
        self.conv1 = MEConv(cin, planes, 3, rng)
        self.norm1 = MEBN(planes, rng)
        self.conv2 = MEConv(planes, planes, 3, rng)
        self.norm2 = MEBN(planes, rng)
        self.downsample = None
        if cin != planes:
            self.downsample = tnn.Sequential(
                MEConv(cin, planes, 1, rng, flat1x1=True), MEBN(planes, rng)
            )

    def forward(self, x, occ):
        y = F.relu(self.norm1(self.conv1(x, occ), occ)) * occ
        y = self.norm2(self.conv2(y, occ), occ)
        r = x
        if self.downsample is not None:
            r = self.downsample[1](self.downsample[0](x, occ), occ)
        return F.relu(y + r) * occ


class TorchRes16UNet14(tnn.Module):
    """Dense ME-semantics Res16UNet14 emitting the reference key space."""

    def __init__(self, rng):
        super().__init__()
        p = PLANES
        self.conv0p1s1 = tnn.Sequential(
            MEConv(CIN, p[0], 3, rng), MEBN(p[0], rng), tnn.ReLU(),
            MEConv(p[0], p[0], 3, rng), MEBN(p[0], rng),
        )
        # channel flow matches res16unet.py: encoder stage i uses planes[i]
        # (stage 1 stays at planes[0]); skip widths are the stage outputs
        self.conv1p1s2 = tnn.Sequential(MEConvDown2(p[0], p[0], rng), MEBN(p[0], rng))
        self.block1 = tnn.Sequential(TorchBasicBlock(p[0], p[0], rng))
        self.conv2p2s2 = tnn.Sequential(MEConvDown2(p[0], p[0], rng), MEBN(p[0], rng))
        self.block2 = tnn.Sequential(TorchBasicBlock(p[0], p[1], rng))
        self.conv3p4s2 = tnn.Sequential(MEConvDown2(p[1], p[1], rng), MEBN(p[1], rng))
        self.block3 = tnn.Sequential(TorchBasicBlock(p[1], p[2], rng))
        self.conv4p8s2 = tnn.Sequential(MEConvDown2(p[2], p[2], rng), MEBN(p[2], rng))
        self.block4 = tnn.Sequential(TorchBasicBlock(p[2], p[3], rng))
        self.convtr4p16s2 = tnn.Sequential(MEConvUp2(p[3], p[4], rng), MEBN(p[4], rng))
        self.block5 = tnn.Sequential(TorchBasicBlock(p[4] + p[2], p[4], rng))
        self.convtr5p8s2 = tnn.Sequential(MEConvUp2(p[4], p[5], rng), MEBN(p[5], rng))
        self.block6 = tnn.Sequential(TorchBasicBlock(p[5] + p[1], p[5], rng))
        self.convtr6p4s2 = tnn.Sequential(MEConvUp2(p[5], p[6], rng), MEBN(p[6], rng))
        self.block7 = tnn.Sequential(TorchBasicBlock(p[6] + p[0], p[6], rng))
        self.convtr7p2s2 = tnn.Sequential(MEConvUp2(p[6], p[7], rng), MEBN(p[7], rng))
        self.block8 = tnn.Sequential(TorchBasicBlock(p[7] + p[0], p[7], rng))
        self.final = MEConv(p[7], NCLS, 1, rng, flat1x1=True)
        self.final.bias = tnn.Parameter(torch.tensor(
            rng.normal(size=NCLS).astype(np.float32) * 0.1))

    @staticmethod
    def _down_occ(occ):
        return (F.max_pool3d(occ, 2) > 0).float()

    def forward(self, x, occ):
        def cnr(seq, x, occ):
            return F.relu(seq[1](seq[0](x, occ), occ)) * occ

        x = x * occ
        out = F.relu(self.conv0p1s1[1](self.conv0p1s1[0](x, occ), occ)) * occ
        out_p1 = F.relu(
            self.conv0p1s1[4](self.conv0p1s1[3](out, occ), occ)
        ) * occ

        occ2 = self._down_occ(occ)
        out = cnr(self.conv1p1s2, out_p1, occ2)
        out_b1 = self.block1[0](out, occ2)
        occ4 = self._down_occ(occ2)
        out = cnr(self.conv2p2s2, out_b1, occ4)
        out_b2 = self.block2[0](out, occ4)
        occ8 = self._down_occ(occ4)
        out = cnr(self.conv3p4s2, out_b2, occ8)
        out_b3 = self.block3[0](out, occ8)
        occ16 = self._down_occ(occ8)
        out = cnr(self.conv4p8s2, out_b3, occ16)
        out = self.block4[0](out, occ16)

        def up(seq, x, occ_f):
            return F.relu(seq[1](seq[0](x, occ_f), occ_f)) * occ_f

        out = up(self.convtr4p16s2, out, occ8)
        out = self.block5[0](torch.cat([out, out_b3], 1), occ8)
        out = up(self.convtr5p8s2, out, occ4)
        out = self.block6[0](torch.cat([out, out_b2], 1), occ4)
        out = up(self.convtr6p4s2, out, occ2)
        out = self.block7[0](torch.cat([out, out_b1], 1), occ2)
        out = up(self.convtr7p2s2, out, occ)
        out = self.block8[0](torch.cat([out, out_p1], 1), occ)
        return self.final(out, occ)


def _scene(rng):
    """Batched occupied voxels + features on an E^3 grid (surface-ish)."""
    coords, feats = [], []
    for b in range(B):
        n = 140 + 20 * b
        xyz = np.unique(rng.integers(0, E, (n, 3)), axis=0)
        coords.append(np.concatenate(
            [np.full((len(xyz), 1), b), xyz], axis=1
        ))
        feats.append(rng.normal(size=(len(xyz), CIN)).astype(np.float32))
    return np.concatenate(coords, 0), np.concatenate(feats, 0)


@pytest.mark.parametrize(
    "method", ["row", "block_resident", "window", "hybrid"]
)
def test_res16unet14_matches_torch_dense_reference(rng, tmp_path, method):
    coords, feats = _scene(rng)
    n = len(coords)
    cap = 512
    assert n <= cap

    tm = TorchRes16UNet14(rng)
    tm.eval()

    # dense inputs
    x = torch.zeros(B, CIN, E, E, E)
    occ = torch.zeros(B, 1, E, E, E)
    for (b, i, j, k), f in zip(coords, feats):
        x[b, :, i, j, k] = torch.tensor(f)
        occ[b, 0, i, j, k] = 1.0
    with torch.no_grad():
        ty = tm(x, occ)
    t_logits = np.stack(
        [ty[b, :, i, j, k].numpy() for (b, i, j, k) in coords]
    )

    # Lightning-format checkpoint -> torch_import -> flax
    ckpt = tmp_path / "ref.ckpt"
    torch.save(
        {"state_dict": {"model." + k: v for k, v in tm.state_dict().items()}},
        str(ckpt),
    )

    cfg.parse_config(
        "CoordinateContext.grid_extent = 16\n"
        f'CoordinateContext.method = "{method}"\n'
        "CoordinateContext.block_cap_divisor = 1\n"
        "CoordinateContext.window_tile = 64\n"
        "CoordinateContext.window_size = 512\n"
    )
    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.models.interface import process_input
    from nerf_downstream_tpu.train.torch_import import (
        import_reference_checkpoint,
    )

    model = get_model(
        name="Res16UNet14", out_channel=NCLS, num_batches=B
    )
    batch = {
        "coordinates": np.zeros((cap, 4), np.float32),
        "features": np.zeros((cap, CIN), np.float32),
        "mask": np.arange(cap) < n,
        "labels": np.zeros(cap, np.int32),
    }
    batch["coordinates"][:n] = coords
    batch["features"][:n] = feats
    field = process_input(batch)
    variables = model.init(jax.random.PRNGKey(0), field, train=False)
    params, stats = import_reference_checkpoint(
        str(ckpt), "Res16UNet14", variables["params"],
        variables.get("batch_stats", {}),
    )
    out = model.apply(
        {"params": params, "batch_stats": stats}, field, train=False
    )
    f_logits = np.asarray(out)[:n]
    assert np.isfinite(f_logits).all()
    np.testing.assert_allclose(f_logits, t_logits, rtol=1e-3, atol=1e-3)
