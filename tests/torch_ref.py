"""From-spec PyTorch oracle of the full reference M2Trans network.

This is NOT the reference's code: it re-implements the architecture spec
(SURVEY.md §2.1/§3.3; reference models/M2Trans_network.py:16-345) with
torch's own ops (Conv2d, F.unfold, PixelShuffle, InstanceNorm2d, GELU) so
that torch itself supplies the op semantics the reference relied on. The
module tree reproduces the reference's state_dict key names exactly
(head.*, body.{i}.attn{k}.qkv_conv/rel_h/rel_w, body.{i}.feed_forward.0.*,
tail.{0,3,6}.*, dead sub_mean/add_mean) so a random-init instance can be
exported through m2trans_tpu.train.convert and compared against the JAX
forward — the strongest available stand-in for the released checkpoints
(absent from the mount, see PARITY.md).

Differences from the reference, on purpose:
  * device-neutral IWT (the reference hard-codes ``.cuda()`` at :223,
    which would crash this CPU oracle);
  * only the live configuration is built (norm=True, num_heads=1, sr=1,
    bias=False qkv — reference :119-122, :37).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def dwt(x: torch.Tensor) -> torch.Tensor:
    """Orthonormal Haar analysis, subband-stacked on channels (ref :203-209)."""
    a = x[:, :, 0::2, 0::2]
    b = x[:, :, 1::2, 0::2]
    c = x[:, :, 0::2, 1::2]
    d = x[:, :, 1::2, 1::2]
    return 0.5 * torch.cat(
        [a + b + c + d, -a - b + c + d, -a + b - c + d, a - b - c + d], dim=1)


def iwt(x: torch.Tensor) -> torch.Tensor:
    """Haar synthesis (ref :219-234), device-neutral."""
    c = x.shape[1] // 4
    ll, hl, lh, hh = x[:, :c], x[:, c:2 * c], x[:, 2 * c:3 * c], x[:, 3 * c:]
    out = x.new_zeros((x.shape[0], c, 2 * x.shape[2], 2 * x.shape[3]))
    out[:, :, 0::2, 0::2] = 0.5 * (ll - hl - lh + hh)
    out[:, :, 1::2, 0::2] = 0.5 * (ll - hl + lh - hh)
    out[:, :, 0::2, 1::2] = 0.5 * (ll + hl - lh - hh)
    out[:, :, 1::2, 1::2] = 0.5 * (ll + hl + lh + hh)
    return out


class TBlock(nn.Module):
    """Single-head halo window attention (ref TBlock :267-345, live config)."""

    def __init__(self, ch: int, block: int = 8, halo: int = 1):
        super().__init__()
        self.block, self.halo, self.ch = block, halo, ch
        win = block + 2 * halo
        self.rel_h = nn.Parameter(torch.randn(1, win, 1, ch // 2))
        self.rel_w = nn.Parameter(torch.randn(1, 1, win, ch // 2))
        self.qkv_conv = nn.Conv2d(ch, 3 * ch, kernel_size=1, bias=False)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        bsz, c, h0, w0 = x.shape
        block, halo, win = self.block, self.halo, self.block + 2 * self.halo
        pr = (block - w0 % block) % block
        pb = (block - h0 % block) % block
        if pr or pb:
            x = F.pad(x, (0, pr, 0, pb), mode="reflect")
        h, w = x.shape[2], x.shape[3]
        nh, nw = h // block, w // block

        q, k, v = torch.chunk(self.qkv_conv(x), 3, dim=1)
        # queries: per non-overlapping block, (B*nblocks, block^2, C)
        q = q.reshape(bsz, c, nh, block, nw, block).permute(0, 2, 4, 3, 5, 1)
        q = q.reshape(bsz * nh * nw, block * block, c) * (c ** -0.5)
        # keys/values: zero-padded haloed windows via torch's own unfold
        # (channel-major (c, i, j) layout -> (B*nblocks, win^2, C))
        k = F.unfold(k, kernel_size=win, stride=block, padding=halo)
        v = F.unfold(v, kernel_size=win, stride=block, padding=halo)
        k = k.reshape(bsz, c, win, win, nh * nw).permute(0, 4, 2, 3, 1)
        v = v.reshape(bsz, c, win, win, nh * nw).permute(0, 4, 2, 3, 1)
        # decomposed rel-pos on k: row embedding on the first half of the
        # channels, column embedding on the second half (ref :322-325)
        kh, kw = k.split(c // 2, dim=-1)
        k = torch.cat([kh + self.rel_h, kw + self.rel_w], dim=-1)
        k = k.reshape(bsz * nh * nw, win * win, c)
        v = v.reshape(bsz * nh * nw, win * win, c)

        attn = torch.softmax(torch.einsum("bic,bjc->bij", q, k), dim=-1)
        out = torch.einsum("bij,bjc->bic", attn, v)
        out = out.reshape(bsz, nh, nw, block, block, c)
        out = out.permute(0, 5, 1, 3, 2, 4).reshape(bsz, c, h, w)
        return out[:, :, :h0, :w0] if (pr or pb) else out

    def reset_parameters_like_reference(self):
        nn.init.kaiming_normal_(self.qkv_conv.weight, mode="fan_out",
                                nonlinearity="relu")
        nn.init.normal_(self.rel_h, 0, 1)
        nn.init.normal_(self.rel_w, 0, 1)


class CFTM(nn.Module):
    """Coarse-to-fine module, norm=True path (ref :114-164)."""

    def __init__(self, nf: int):
        super().__init__()
        self.attn1 = TBlock(nf // 4)
        self.attn2 = TBlock(nf)
        self.attn3 = TBlock(nf * 4)
        self.attn4 = TBlock(nf * 4)
        self.feed_forward = nn.Sequential(
            nn.Conv2d(nf, nf, kernel_size=3, padding=1, bias=True))
        self.norm = nn.InstanceNorm2d(nf)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x1, x2, x3, x4 = torch.chunk(self.norm(x), 4, dim=1)
        x1 = self.attn1(x1) + x1
        x2 = (x2 + x1) / 2.0
        x2 = iwt(self.attn2(dwt(x2))) + x2
        x3 = (x3 + x2) / 2.0
        x3 = iwt(iwt(self.attn3(dwt(dwt(x3))))) + x3
        x4 = (x4 + x3) / 2.0
        x4 = iwt(iwt(self.attn4(dwt(dwt(x4))))) + x4
        return self.feed_forward(torch.cat([x1, x2, x3, x4], dim=1)) + x


class TorchM2Trans(nn.Module):
    """Full reference network from spec (ref :16-112)."""

    def __init__(self, scale: int, n_feats: int = 64, n_blocks: int = 8,
                 colors: int = 3, rgb_range: float = 1.0):
        super().__init__()
        self.scale, self.rgb_range = scale, rgb_range
        # dead MeanShift convs, kept for checkpoint-key parity (ref :30-31)
        rgb_mean = torch.tensor([0.4488, 0.4371, 0.4040])
        for name, sign in (("sub_mean", -1.0), ("add_mean", 1.0)):
            conv = nn.Conv2d(3, 3, kernel_size=1)
            with torch.no_grad():
                conv.weight.copy_(torch.eye(3).reshape(3, 3, 1, 1))
                conv.bias.copy_(sign * rgb_range * rgb_mean)
            setattr(self, name, conv)
        self.head = nn.Conv2d(colors, n_feats, kernel_size=3, padding=1,
                              padding_mode="reflect")
        self.body = nn.ModuleList([CFTM(n_feats) for _ in range(n_blocks)])
        if scale == 4:
            self.tail = nn.Sequential(
                nn.Conv2d(n_feats, n_feats * 4, kernel_size=1),
                nn.PixelShuffle(2), nn.GELU(),
                nn.Conv2d(n_feats, n_feats * 4, kernel_size=1),
                nn.PixelShuffle(2), nn.GELU(),
                nn.Conv2d(n_feats, 3, kernel_size=3, padding=1, bias=False,
                          padding_mode="reflect"))
        else:
            self.tail = nn.Sequential(
                nn.Conv2d(n_feats, n_feats * scale * scale, kernel_size=1),
                nn.PixelShuffle(scale), nn.GELU(),
                nn.Conv2d(n_feats, 3, kernel_size=3, padding=1, bias=False,
                          padding_mode="reflect"))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        h, w = x.shape[2], x.shape[3]
        pad = 32  # LCM of window_sizes [8, 16, 32] (ref :78-85)
        ph = (pad - h % pad) % pad
        pw = (pad - w % pad) % pad
        if ph or pw:
            x = F.pad(x, (0, pw, 0, ph), mode="reflect")
        res = self.head(x)
        y = res
        for blk in self.body:
            y = blk(y)
        y = self.tail(res + y)
        y = torch.clamp(y, 0.0, self.rgb_range)
        return y[:, :, : h * self.scale, : w * self.scale]
