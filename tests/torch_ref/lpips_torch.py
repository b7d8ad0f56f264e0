"""Torch reference LPIPS(VGG16) fixture.

Our own torch implementation of the published LPIPS-VGG metric (scaling
layer -> VGG16 features -> unit-normalize -> non-negative 1x1 lin heads ->
spatial mean -> sum over taps), with torchvision's ``features.{i}`` and
lpips's ``lin{i}.model.1`` state-dict naming. Test fixture only.
"""

import torch
import torch.nn as nn


_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512]
_TAP_RELUS = [3, 8, 15, 22, 29]  # features indices of relu1_2..relu5_3


class TorchVGG16Features(nn.Module):
    """torchvision-style vgg16 .features (convs + relus + maxpools)."""

    def __init__(self):
        super().__init__()
        layers = []
        cin = 3
        for v in _PLAN:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                cin = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in _TAP_RELUS:
                taps.append(x)
        return taps


class TorchLPIPS(nn.Module):
    _SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    _SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __init__(self):
        super().__init__()
        self.vgg = TorchVGG16Features()
        chans = [64, 128, 256, 512, 512]
        for i, c in enumerate(chans):
            # lpips NetLinLayer: wraps Sequential(Dropout, Conv) as .model
            holder = nn.Module()
            holder.model = nn.Sequential(nn.Dropout(0.0),
                                         nn.Conv2d(c, 1, 1, bias=False))
            with torch.no_grad():
                holder.model[1].weight.abs_()
            setattr(self, f"lin{i}", holder)

    def forward(self, a, b):
        """a, b: [N, 3, H, W] in [-1, 1]; returns scalar batch mean."""
        fa = self.vgg((a - self._SHIFT) / self._SCALE)
        fb = self.vgg((b - self._SHIFT) / self._SCALE)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / xa.norm(dim=1, keepdim=True).clamp_min(1e-10)
            nb = xb / xb.norm(dim=1, keepdim=True).clamp_min(1e-10)
            d = (na - nb) ** 2
            lin = getattr(self, f"lin{i}").model
            total = total + lin(d).mean()
        return total
