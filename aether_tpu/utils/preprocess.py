"""Host-side input preprocessing (aspect crop, resize, normalization).

Mirrors reference ``aether/utils/preprocess_utils.py`` (``imcrop_center`` aspect
center crop, padded ``crop``) and the diffusers VideoProcessor path consumed at
``aetherv1_pipeline_cogvideox.py:451-512``: crop to target aspect, bilinear resize
to (height, width), scale to [-1, 1].
"""

from __future__ import annotations

from typing import List, Sequence, Union

import cv2
import numpy as np


def crop_pad(
    img: np.ndarray, start_h: int, start_w: int, crop_h: int, crop_w: int
) -> np.ndarray:
    """Crop a window, zero-padding where it exceeds the image bounds."""
    out = np.zeros((crop_h, crop_w, *img.shape[2:]), dtype=img.dtype)
    hsize, wsize = crop_h, crop_w
    dh, dw, sh, sw = start_h, start_w, 0, 0
    if dh < 0:
        sh = -dh
        hsize += dh
        dh = 0
    if dh + hsize > img.shape[0]:
        hsize = img.shape[0] - dh
    if dw < 0:
        sw = -dw
        wsize += dw
        dw = 0
    if dw + wsize > img.shape[1]:
        wsize = img.shape[1] - dw
    out[sh : sh + hsize, sw : sw + wsize] = img[dh : dh + hsize, dw : dw + wsize]
    return out


def imcrop_center(
    img_list: Sequence[np.ndarray], crop_p_h: int, crop_p_w: int
) -> List[np.ndarray]:
    """Center-crop each (H, W, C) frame to the target aspect ratio."""
    new_img = []
    for _img in img_list:
        if crop_p_h / crop_p_w > _img.shape[0] / _img.shape[1]:  # crop left/right
            start_h = 0
            start_w = int((_img.shape[1] - _img.shape[0] / crop_p_h * crop_p_w) / 2)
            crop_size = (_img.shape[0], int(_img.shape[0] / crop_p_h * crop_p_w))
        else:  # crop top/bottom
            start_h = int((_img.shape[0] - _img.shape[1] / crop_p_w * crop_p_h) / 2)
            start_w = 0
            crop_size = (int(_img.shape[1] / crop_p_w * crop_p_h), _img.shape[1])
        new_img.append(crop_pad(_img, start_h, start_w, crop_size[0], crop_size[1]))
    return new_img


def _to_float01(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def preprocess_image(
    image: Union[np.ndarray, "object"], height: int, width: int
) -> np.ndarray:
    """Single image -> (height, width, 3) float32 in [-1, 1].

    Accepts uint8/float numpy (H, W, 3) or a PIL image. PIL inputs follow the
    'crop' resize mode (fill-resize then center crop); numpy inputs follow the
    reference's imcrop_center + resize path.
    """
    if not isinstance(image, np.ndarray):  # PIL path
        image = np.asarray(image.convert("RGB"))
        img = _to_float01(image)
        h, w = img.shape[:2]
        scale = max(height / h, width / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        top = (nh - height) // 2
        left = (nw - width) // 2
        img = img[top : top + height, left : left + width]
    else:
        img = _to_float01(image)
        img = imcrop_center([img], height, width)[0]
        if img.shape[:2] != (height, width):
            img = cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    return img * 2.0 - 1.0


def preprocess_video(
    video: Union[np.ndarray, Sequence], height: int, width: int
) -> np.ndarray:
    """Video -> (F, height, width, 3) float32 in [-1, 1]."""
    if isinstance(video, np.ndarray):
        frames = [video[i] for i in range(video.shape[0])]
    else:
        frames = list(video)
    return np.stack([preprocess_image(f, height, width) for f in frames], axis=0)


def preprocess_video_u8(
    video: Union[np.ndarray, Sequence], height: int, width: int
) -> np.ndarray:
    """Video -> (F, height, width, 3) uint8 wire format.

    Same resize/crop as :func:`preprocess_video` but returns uint8 so the
    host->device transfer moves 4x fewer bytes (tunneled TPUs are
    transfer-bound); the [-1, 1] normalization happens on device.
    """
    f32 = preprocess_video(video, height, width)  # [-1, 1]
    return np.round((f32 + 1.0) * 127.5).astype(np.uint8)


def preprocess_image_u8(image, height: int, width: int) -> np.ndarray:
    f32 = preprocess_image(image, height, width)
    return np.round((f32 + 1.0) * 127.5).astype(np.uint8)
