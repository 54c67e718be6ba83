"""Minimal torchvision shim so the ACTUAL reference dataset imports.

torchvision is not installed in this venv (torch is). The reference's
`src/dataset/robonet/robonet_dataset.py:8-10` needs only a handful of
transforms; this module registers faithful tensor-mode implementations in
`sys.modules` so the reference class can be imported and *executed* for
golden tests (tests/test_dataset_golden.py).

Fidelity notes
  * ToTensor: numpy HWC -> torch CHW float; divides by 255 iff uint8
    (exactly torchvision's numpy branch).
  * Resize: tensor-mode bilinear `F.interpolate(..., align_corners=False)`
    == torchvision's pre-antialias tensor Resize (the mode the reference
    runs in: its inputs are tensors from ToTensor, not PIL images).
  * crop / RandomCrop.get_params: exact.
  * adjust_brightness: exact; adjust_contrast/saturation/hue: approximate
    (the augmentation path is stochastic via the process-global `random`
    module and is not goldened — see test_dataset_golden.py docstring).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn.functional as NF


class ToTensor:
    def __call__(self, pic):
        if isinstance(pic, torch.Tensor):
            return pic
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if arr.dtype == np.uint8:
            return t.to(torch.float32).div_(255.0)
        return t.to(torch.float32)


def resize(img: torch.Tensor, size, **_ignored):
    h, w = int(size[0]), int(size[1])
    if img.shape[-2:] == (h, w):
        return img
    batched = img.dim() == 4
    x = img if batched else img[None]
    out = NF.interpolate(
        x.to(torch.float32), size=(h, w), mode="bilinear", align_corners=False
    )
    return out if batched else out[0]


class Resize:
    def __init__(self, size, **_ignored):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        return resize(img, self.size)


class Compose:
    def __init__(self, fns):
        self.fns = list(fns)

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


class Lambda:
    def __init__(self, f):
        self.f = f

    def __call__(self, x):
        return self.f(x)


def crop(img: torch.Tensor, i, j, th, tw):
    return img[..., i : i + th, j : j + tw]


class RandomCrop:
    @staticmethod
    def get_params(img: torch.Tensor, output_size):
        h, w = img.shape[-2:]
        th, tw = output_size
        if h == th and w == tw:
            return 0, 0, th, tw
        i = int(torch.randint(0, h - th + 1, (1,)).item())
        j = int(torch.randint(0, w - tw + 1, (1,)).item())
        return i, j, th, tw


def adjust_brightness(img, factor):
    return (img * factor).clamp(0.0, 1.0)


def _grayscale(img):
    r, g, b = img[-3], img[-2], img[-1]
    return (0.2989 * r + 0.587 * g + 0.114 * b)[None]


def adjust_contrast(img, factor):
    mean = _grayscale(img).mean((-2, -1), keepdim=True)
    return (factor * img + (1 - factor) * mean).clamp(0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _grayscale(img)
    return (factor * img + (1 - factor) * gray).clamp(0.0, 1.0)


def adjust_hue(img, factor):  # approximate: channel rotation blend
    rolled = torch.roll(img, 1, dims=-3)
    return ((1 - abs(factor)) * img + abs(factor) * rolled).clamp(0.0, 1.0)


def install():
    """Force-register torchvision modules with these implementations.

    Overwrites any attribute a previous coarse stub (e.g.
    test_reference_golden._install_stubs) may have left behind."""
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = sys.modules.get("torchvision.transforms") or types.ModuleType(
        "torchvision.transforms"
    )
    fn = sys.modules.get("torchvision.transforms.functional") or types.ModuleType(
        "torchvision.transforms.functional"
    )
    for k, v in (
        ("ToTensor", ToTensor),
        ("Resize", Resize),
        ("Compose", Compose),
        ("Lambda", Lambda),
        ("RandomCrop", RandomCrop),
    ):
        setattr(tr, k, v)
    for k, v in (
        ("resize", resize),
        ("crop", crop),
        ("adjust_brightness", adjust_brightness),
        ("adjust_contrast", adjust_contrast),
        ("adjust_saturation", adjust_saturation),
        ("adjust_hue", adjust_hue),
    ):
        setattr(fn, k, v)
    tv.transforms = tr
    tr.functional = fn
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn
