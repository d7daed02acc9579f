import torch
from PIL import Image
import numpy as np


class ImageReadMode:
    GRAY = "GRAY"
    RGB = "RGB"
    UNCHANGED = "UNCHANGED"


def decode_image(path, mode=ImageReadMode.UNCHANGED):
    img = Image.open(str(path))
    if mode == ImageReadMode.GRAY:
        img = img.convert("L")
    elif mode == ImageReadMode.RGB:
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    else:
        arr = arr.transpose(2, 0, 1)
    return torch.from_numpy(arr.copy())
