"""Cross-framework parity: JAX causal 3D VAE vs an independent torch build.

The torch model is written directly from the published AutoencoderKLCogVideoX
architecture (causal temporal padding, GroupNorm / MoVQ SpatialNorm3D,
first-frame-aware temporal down/up sampling) with upstream state-dict naming —
one test validates both ``convert_vae_state_dict``'s name mapping and the JAX
encoder/decoder math against a second implementation.
"""

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from aether_tpu.config import VAEConfig
from aether_tpu.io.weights import convert_vae_state_dict
from aether_tpu.models.vae import vae_decode, vae_encode

torch.manual_seed(0)


class CausalConv3d(nn.Module):
    """Replicate-first-frame temporal pad + zero spatial pad, exposing ``.conv``.

    ``cache``/``name``: optional framewise-mode conv cache (mirrors diffusers'
    ``conv_cache`` mechanism) — the conv keeps its last k-1 input frames so
    chunked processing threads temporal context across chunks. Normalization
    statistics stay per-chunk, which is what makes the chunked ("framewise")
    mode the checkpoint's canonical numerics, distinct from a full-clip pass.
    """

    def __init__(self, cin, cout, k=3, spatial_stride=1):
        super().__init__()
        self.k = k
        self.conv = nn.Conv3d(cin, cout, k, stride=(1, spatial_stride,
                                                    spatial_stride))

    def forward(self, x, cache=None, name=""):  # x: (B, C, T, H, W)
        if self.k > 1:
            prev = None if cache is None else cache["in"].get(name)
            if prev is None:
                front = x[:, :, :1].repeat(1, 1, self.k - 1, 1, 1)
            else:
                front = prev
            x = torch.cat([front, x], dim=2)
            if cache is not None:
                cache["out"][name] = x[:, :, -(self.k - 1):].clone()
            pad = self.k // 2
            x = F.pad(x, (pad, pad, pad, pad))  # W then H, zero
        return self.conv(x)


def _nearest(z, t, h, w):
    return F.interpolate(z, size=(t, h, w), mode="nearest")


def _nearest_first_aware(zq, t, h, w):
    if zq.shape[2] > 1 and t % 2 == 1 and t > 1:
        z_first = _nearest(zq[:, :, :1], 1, h, w)
        z_rest = _nearest(zq[:, :, 1:], t - 1, h, w)
        return torch.cat([z_first, z_rest], dim=2)
    return _nearest(zq, t, h, w)


class SpatialNorm3D(nn.Module):
    def __init__(self, ch, zq_ch, groups):
        super().__init__()
        self.norm_layer = nn.GroupNorm(groups, ch, eps=1e-6)
        self.conv_y = CausalConv3d(zq_ch, ch, k=1)
        self.conv_b = CausalConv3d(zq_ch, ch, k=1)

    def forward(self, f, zq):
        zq = _nearest_first_aware(zq, f.shape[2], f.shape[3], f.shape[4])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout, groups, zq_ch=None):
        super().__init__()
        self.spatial = zq_ch is not None
        mk_norm = (lambda ch: SpatialNorm3D(ch, zq_ch, groups) if self.spatial
                   else nn.GroupNorm(groups, ch, eps=1e-6))
        self.norm1 = mk_norm(cin)
        self.conv1 = CausalConv3d(cin, cout)
        self.norm2 = mk_norm(cout)
        self.conv2 = CausalConv3d(cout, cout)
        if cin != cout:
            self.conv_shortcut = nn.Conv3d(cin, cout, 1)

    def forward(self, x, zq=None, cache=None, name=""):
        h = self.norm1(x, zq) if self.spatial else self.norm1(x)
        h = self.conv1(F.silu(h), cache, name + "/conv1")
        h = self.norm2(h, zq) if self.spatial else self.norm2(h)
        h = self.conv2(F.silu(h), cache, name + "/conv2")
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Downsampler(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2)
        self.compress_time = compress_time

    def forward(self, x):  # (B, C, T, H, W)
        if self.compress_time:
            t = x.shape[2]
            if t % 2 == 1 and t > 1:
                xf, xr = x[:, :, :1], x[:, :, 1:]
                xr = (xr[:, :, 0::2] + xr[:, :, 1::2]) * 0.5
                x = torch.cat([xf, xr], dim=2)
            elif t > 1:
                x = (x[:, :, 0::2] + x[:, :, 1::2]) * 0.5
        x = F.pad(x, (0, 1, 0, 1))
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class Upsampler(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)
        self.compress_time = compress_time

    def forward(self, x):
        b, c, t, h, w = x.shape
        if self.compress_time:
            if t > 1 and t % 2 == 1:
                xf = _nearest(x[:, :, :1], 1, 2 * h, 2 * w)
                xr = _nearest(x[:, :, 1:], 2 * (t - 1), 2 * h, 2 * w)
                x = torch.cat([xf, xr], dim=2)
            else:
                x = _nearest(x, max(2 * t, 1) if t > 1 else 1, 2 * h, 2 * w)
        else:
            x = _nearest(x, t, 2 * h, 2 * w)
        b, c, t2, h2, w2 = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t2, c, h2, w2)
        x = self.conv(x)
        return x.reshape(b, t2, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class TorchCogVAE(nn.Module):
    """Encoder+decoder with upstream state-dict naming."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chs = cfg.block_out_channels
        g = cfg.norm_num_groups
        lat = cfg.latent_channels
        tcl = cfg.temporal_compress_level

        enc = nn.Module()
        enc.conv_in = CausalConv3d(cfg.in_channels, chs[0])
        enc.down_blocks = nn.ModuleList()
        cin = chs[0]
        for i, cout in enumerate(chs):
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [ResnetBlock(cin if j == 0 else cout, cout, g)
                 for j in range(cfg.layers_per_block)]
            )
            if i < len(chs) - 1:
                block.downsamplers = nn.ModuleList(
                    [Downsampler(cout, compress_time=i < tcl)]
                )
            enc.down_blocks.append(block)
            cin = cout
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(chs[-1], chs[-1], g) for _ in range(2)]
        )
        enc.norm_out = nn.GroupNorm(g, chs[-1], eps=1e-6)
        enc.conv_out = CausalConv3d(chs[-1], 2 * lat)
        self.encoder = enc

        dec = nn.Module()
        rev = list(reversed(chs))
        dec.conv_in = CausalConv3d(lat, rev[0])
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(rev[0], rev[0], g, zq_ch=lat) for _ in range(2)]
        )
        dec.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, cout in enumerate(rev):
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [ResnetBlock(cin if j == 0 else cout, cout, g, zq_ch=lat)
                 for j in range(cfg.layers_per_block + 1)]
            )
            if i < len(rev) - 1:
                block.upsamplers = nn.ModuleList(
                    [Upsampler(cout, compress_time=i < tcl)]
                )
            dec.up_blocks.append(block)
            cin = cout
        dec.norm_out = SpatialNorm3D(rev[-1], lat, g)
        dec.conv_out = CausalConv3d(rev[-1], cfg.out_channels)
        self.decoder = dec
        self.tcl = tcl
        self.cfg = cfg

    def encode(self, x, collect=None, cache=None):  # (B, C, T, H, W) -> moments
        e = self.encoder
        x = e.conv_in(x, cache, "enc/conv_in")
        for i, block in enumerate(e.down_blocks):
            for j, r in enumerate(block.resnets):
                x = r(x, cache=cache, name=f"enc/down{i}/res{j}")
            if hasattr(block, "downsamplers"):
                x = block.downsamplers[0](x)
            if collect is not None:
                collect.append(x.detach().clone())
        for j, r in enumerate(e.mid_block.resnets):
            x = r(x, cache=cache, name=f"enc/mid/res{j}")
        if collect is not None:
            collect.append(x.detach().clone())
        x = e.conv_out(F.silu(e.norm_out(x)), cache, "enc/conv_out")
        return x

    def decode(self, z, collect=None, cache=None):
        d = self.decoder
        zq = z
        x = d.conv_in(z, cache, "dec/conv_in")
        for j, r in enumerate(d.mid_block.resnets):
            x = r(x, zq, cache=cache, name=f"dec/mid/res{j}")
        if collect is not None:
            collect.append(x.detach().clone())
        for i, block in enumerate(d.up_blocks):
            for j, r in enumerate(block.resnets):
                x = r(x, zq, cache=cache, name=f"dec/up{i}/res{j}")
            if hasattr(block, "upsamplers"):
                x = block.upsamplers[0](x)
            if collect is not None:
                collect.append(x.detach().clone())
        x = d.conv_out(F.silu(d.norm_out(x, zq)), cache, "dec/conv_out")
        return x

    # -- framewise (chunked) mode: the checkpoint's canonical numerics -------
    # Mirrors diffusers' frame batching: first chunk takes the remainder
    # (start = fbs*i + (0 if i == 0 else rem), end = fbs*(i+1) + rem), conv
    # caches thread temporal context, norm stats stay per-chunk.
    def _chunk_spans(self, t, fbs):
        n = max(t // fbs, 1)
        rem = t % fbs if t > fbs else 0
        spans, start = [], 0
        for i in range(n):
            end = min(fbs + rem if i == 0 else start + fbs, t)
            spans.append((start, end))
            start = end
        return spans

    def encode_chunked(self, x, frame_batch_size=8):
        """Chunked encode over pixel frames (diffusers
        ``num_sample_frames_batch_size`` = 8)."""
        cache = {"in": {}, "out": {}}
        outs = []
        for s, e in self._chunk_spans(x.shape[2], frame_batch_size):
            outs.append(self.encode(x[:, :, s:e], cache=cache))
            cache = {"in": cache["out"], "out": {}}
        return torch.cat(outs, dim=2)

    def decode_chunked(self, z, frame_batch_size=2):
        """Chunked decode over latent frames (diffusers
        ``num_latent_frames_batch_size`` = 2); each chunk's zq is the chunk."""
        cache = {"in": {}, "out": {}}
        outs = []
        for s, e in self._chunk_spans(z.shape[2], frame_batch_size):
            outs.append(self.decode(z[:, :, s:e], cache=cache))
            cache = {"in": cache["out"], "out": {}}
        return torch.cat(outs, dim=2)


@pytest.fixture(scope="module")
def vae_pair():
    cfg = VAEConfig.tiny()
    model = TorchCogVAE(cfg).eval()
    params = convert_vae_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def test_vae_encoder_matches_torch(vae_pair):
    cfg, model, params = vae_pair
    rng = np.random.default_rng(0)
    video = rng.uniform(-1, 1, size=(1, 5, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.encode(
            torch.from_numpy(video).permute(0, 4, 1, 2, 3)
        ).permute(0, 2, 3, 4, 1).numpy()
    ours_mean = np.asarray(vae_encode(params, cfg, video, sample_mode="argmax"))
    np.testing.assert_allclose(
        ours_mean, ref[..., : cfg.latent_channels], atol=2e-4, rtol=1e-4
    )


def test_vae_decoder_matches_torch(vae_pair):
    cfg, model, params = vae_pair
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, 2, 4, 6, cfg.latent_channels)).astype(np.float32)
    with torch.no_grad():
        ref = model.decode(
            torch.from_numpy(z).permute(0, 4, 1, 2, 3)
        ).permute(0, 2, 3, 4, 1).numpy()
    ours = np.asarray(vae_decode(params, cfg, z))
    assert ours.shape == ref.shape  # (1, 5, 32, 48, 3): 4x temporal, 8x spatial
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_vae_per_stage_activations_match_torch(vae_pair):
    """Layerwise (per down/up block) activation diffing vs the torch reference
    (VERDICT round 1, item 4 — the VAE half): catches norm-placement /
    causal-padding / resampling regressions that end-output tolerances hide."""
    from aether_tpu.models.vae import decode_frames, encode_moments

    cfg, model, params = vae_pair
    rng = np.random.default_rng(8)
    video = rng.uniform(-1, 1, size=(1, 5, 32, 48, 3)).astype(np.float32)

    ref_stages = []
    with torch.no_grad():
        model.encode(torch.from_numpy(video).permute(0, 4, 1, 2, 3),
                     collect=ref_stages)
    ours_stages = []
    encode_moments(params, cfg, video, collect=ours_stages)
    assert len(ours_stages) == len(ref_stages) > 0
    for i, (ours, ref) in enumerate(zip(ours_stages, ref_stages)):
        ref_np = ref.permute(0, 2, 3, 4, 1).numpy()  # NCTHW -> NTHWC
        diff = float(np.max(np.abs(np.asarray(ours) - ref_np)))
        assert diff < 5e-4, f"encoder stage {i} drifted: {diff}"

    z = rng.normal(size=(1, 2, 4, 6, cfg.latent_channels)).astype(np.float32)
    ref_stages = []
    with torch.no_grad():
        model.decode(torch.from_numpy(z).permute(0, 4, 1, 2, 3),
                     collect=ref_stages)
    ours_stages = []
    decode_frames(params, cfg, z, collect=ours_stages)
    assert len(ours_stages) == len(ref_stages) > 0
    for i, (ours, ref) in enumerate(zip(ours_stages, ref_stages)):
        ref_np = ref.permute(0, 2, 3, 4, 1).numpy()
        diff = float(np.max(np.abs(np.asarray(ours) - ref_np)))
        assert diff < 5e-4, f"decoder stage {i} drifted: {diff}"
