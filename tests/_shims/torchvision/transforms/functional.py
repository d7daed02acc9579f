import torch
import torch.nn.functional as F


class InterpolationMode:
    BILINEAR = "bilinear"
    NEAREST = "nearest"


def resize(img, size, interpolation=InterpolationMode.BILINEAR, antialias=True):
    mode = "bilinear" if interpolation in (InterpolationMode.BILINEAR, "bilinear") else "nearest"
    unsq = img.dim() == 3
    x = img.float().unsqueeze(0) if unsq else img.float()
    out = F.interpolate(x, size=list(size), mode=mode, align_corners=False if mode == "bilinear" else None,
                        antialias=antialias if mode == "bilinear" else False)
    return out.squeeze(0) if unsq else out
