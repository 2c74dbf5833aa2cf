"""Image / volume I/O: TIFF (3-D), PNG/JPG (2-D), MP4 (3-D).

Capability parity: reference utils/tool.py:32-103 (read_img/save_img,
read_video/save_video, get_dimension).  tifffile is absent in this image, so
3-D TIFF goes through cv2.imreadmulti/imwritemulti (verified lossless for
multi-page uint8/uint16), with a minimal pure-NumPy baseline-TIFF fallback
codec for environments without cv2 TIFF support.

Layouts match the reference: 3-D -> (d, h, w, c); 2-D -> (h, w, c).
"""
from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def get_dimension(path: str) -> int:
    """2 for PNG/JPG, 3 for TIFF/MP4 (reference utils/tool.py:32-42)."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".tif", ".tiff", ".mp4"):
        return 3
    if ext in (".png", ".jpg"):
        return 2
    raise NotImplementedError(ext)


# ------------------------------------------------------------------ TIFF ---
def read_tiff(path: str) -> np.ndarray:
    if _HAS_CV2:
        ok, pages = cv2.imreadmulti(path, flags=cv2.IMREAD_UNCHANGED)
        if ok and pages:
            return np.stack(pages)
    return _read_tiff_minimal(path)


def save_tiff(path: str, volume: np.ndarray) -> None:
    volume = np.asarray(volume)
    if volume.ndim == 4 and volume.shape[-1] == 1:
        volume = volume[..., 0]
    if volume.ndim == 2:
        volume = volume[None]
    if _HAS_CV2:
        if cv2.imwritemulti(path, [np.ascontiguousarray(p) for p in volume]):
            return
    _write_tiff_minimal(path, volume)


def _read_tiff_minimal(path: str) -> np.ndarray:
    """Minimal baseline-TIFF reader (uncompressed, grayscale, strips)."""
    with open(path, "rb") as f:
        data = f.read()
    bo = data[:2]
    endian = "<" if bo == b"II" else ">"
    (magic,) = struct.unpack(endian + "H", data[2:4])
    assert magic == 42, "not a classic TIFF"
    (off,) = struct.unpack(endian + "I", data[4:8])
    pages = []
    while off:
        (n_tags,) = struct.unpack(endian + "H", data[off:off + 2])
        tags = {}
        for i in range(n_tags):
            t = off + 2 + 12 * i
            tag, typ, cnt = struct.unpack(endian + "HHI", data[t:t + 8])
            fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
            if fmt is None:
                continue
            size = struct.calcsize(fmt) * cnt
            if size <= 4:
                vals = struct.unpack(endian + fmt * cnt, data[t + 8:t + 8 + size])
            else:
                (voff,) = struct.unpack(endian + "I", data[t + 8:t + 12])
                vals = struct.unpack(endian + fmt * cnt, data[voff:voff + size])
            tags[tag] = vals
        w = tags[256][0]
        h = tags[257][0]
        bits = tags.get(258, (8,))[0]
        comp = tags.get(259, (1,))[0]
        assert comp == 1, "minimal TIFF codec supports uncompressed only"
        offsets = tags[273]
        counts = tags.get(279, (h * w * bits // 8,))
        raw = b"".join(data[o:o + c] for o, c in zip(offsets, counts))
        dtype = {8: np.uint8, 16: np.uint16, 32: np.float32}[bits]
        sf = tags.get(339, (1,))[0]
        if bits == 32 and sf == 3:
            dtype = np.float32
        page = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder(endian))
        pages.append(page[: h * w].reshape(h, w))
        (off,) = struct.unpack(endian + "I",
                               data[off + 2 + 12 * n_tags:off + 6 + 12 * n_tags])
    return np.stack(pages)


def _write_tiff_minimal(path: str, volume: np.ndarray) -> None:
    """Minimal baseline-TIFF writer (uncompressed, grayscale, one strip/page)."""
    volume = np.ascontiguousarray(volume)
    d, h, w = volume.shape[:3]
    bits = volume.dtype.itemsize * 8
    sample_format = 3 if volume.dtype.kind == "f" else 1
    # layout: header | page0 data | page0 IFD | page1 data | page1 IFD | ...
    chunks = [volume[i].tobytes() for i in range(d)]
    with open(path, "wb") as f:
        f.write(b"II*\x00")
        first_ifd = 8 + len(chunks[0])
        f.write(struct.pack("<I", first_ifd))
        cursor = 8
        for i in range(d):
            f.write(chunks[i])
            data_off = cursor
            cursor += len(chunks[i])
            tags = [
                (256, 4, 1, w),
                (257, 4, 1, h),
                (258, 3, 1, bits),
                (259, 3, 1, 1),
                (262, 3, 1, 1),
                (273, 4, 1, data_off),
                (279, 4, 1, len(chunks[i])),
                (339, 3, 1, sample_format),
            ]
            ifd = struct.pack("<H", len(tags))
            for tag, typ, cnt, val in tags:
                ifd += struct.pack("<HHII", tag, typ, cnt, val)
            next_off = cursor + 2 + 12 * len(tags) + 4 + (len(chunks[i + 1]) if i + 1 < d else 0)
            ifd += struct.pack("<I", next_off if i + 1 < d else 0)
            f.write(ifd)
            cursor += 2 + 12 * len(tags) + 4


# ------------------------------------------------------------------ video ---
def read_video(path: str) -> np.ndarray:
    assert _HAS_CV2, "mp4 I/O requires cv2"
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    return np.stack(frames)


def save_video(fps: int, path: str, imgs: np.ndarray) -> None:
    assert _HAS_CV2, "mp4 I/O requires cv2"
    fourcc = cv2.VideoWriter_fourcc("D", "I", "V", "X")
    h, w = imgs.shape[1], imgs.shape[2]
    out = cv2.VideoWriter(path, fourcc, fps, (w, h))
    for img in imgs:
        out.write(img)
    out.release()


# -------------------------------------------------------------- dispatch ---
def read_img(path: str) -> np.ndarray:
    """3-D -> (d,h,w,c); 2-D -> (h,w,c)  (reference utils/tool.py:73-92)."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".tif", ".tiff"):
        img = read_tiff(path)
        if img.ndim == 3:
            img = img[..., None]
        assert img.ndim == 4
        return img
    if ext == ".mp4":
        img = read_video(path)
        if img.ndim == 3:
            img = img[..., None]
        assert img.ndim == 4
        return img
    if ext in (".png", ".jpg"):
        img = cv2.imread(path, -1)
        if img.ndim == 2:
            img = img[..., None]
        assert img.ndim == 3
        return img
    raise NotImplementedError(ext)


def save_img(path: str, img: np.ndarray) -> None:
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".tif", ".tiff"):
        save_tiff(path, img)
    elif ext == ".mp4":
        save_video(25, path, img)
    elif ext in (".png", ".jpg"):
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        cv2.imwrite(path, img)
    else:
        raise NotImplementedError(ext)


def get_folder_size(folder_path: str) -> int:
    """Recursive on-disk size in bytes (reference utils/io.py:216-227)."""
    if not os.path.isdir(folder_path):
        return os.path.getsize(folder_path)
    total = 0
    for dirpath, _dirnames, filenames in os.walk(folder_path):
        for fname in filenames:
            fp = os.path.join(dirpath, fname)
            if not os.path.islink(fp):
                total += os.path.getsize(fp)
    return total
