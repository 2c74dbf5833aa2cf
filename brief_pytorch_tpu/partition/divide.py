"""Uniform volume division, parameter allocation, merge.

Capability parity: reference utils/misc.py:329-445 (divide_data, alloc_param,
merge_divided_data) and utils/adaptive_blocking.py:425-460 (cal_factor,
cal_divide_num) and :16-24 (cal_feature FFT sharpness score).

Chunk naming contract (preserved for interop with the deblock tools and the
merged-module directory layout): 3-D 'd_{z0}_{z1}-h_{y0}_{y1}-w_{x0}_{x1}',
2-D 'h_{y0}_{y1}-w_{x0}_{x1}' with INCLUSIVE end indices
(reference main.py:477-480, utils/misc.py:366,391).
"""
from __future__ import annotations

import copy
from typing import Dict, List, Tuple

import numpy as np


def cal_feature(image: np.ndarray) -> float:
    """FFT sharpness score max/sum (reference adaptive_blocking.py:16-24).
    2-D (h,w,c) images are converted to grayscale; 3-D uses a 3-axis FFT."""
    if image.ndim == 3:
        if image.shape[-1] == 3:
            try:
                import cv2
                gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
            except Exception:
                gray = image.mean(-1)
        else:
            gray = image[..., 0] if image.shape[-1] == 1 else image
        f = np.fft.fft(np.fft.fft(gray, axis=0), axis=1)
    elif image.ndim == 4 or image.ndim == 2:
        f = image
        for ax in range(min(3, image.ndim)):
            f = np.fft.fft(f, axis=ax)
    else:
        raise NotImplementedError(image.shape)
    f = np.abs(f)
    total = int(f.sum())
    if total == 0:   # all-zero chunk (blank background): the reference's
        return 0.0   # int()/int() would raise ZeroDivisionError here
    return int(f.max()) / total


def _chunk_name(chunk: Dict) -> str:
    if "d" in chunk:
        return "d_{}_{}-h_{}_{}-w_{}_{}".format(*chunk["d"], *chunk["h"],
                                                *chunk["w"])
    return "h_{}_{}-w_{}_{}".format(*chunk["h"], *chunk["w"])


def parse_chunk_name(name: str) -> Dict[str, List[int]]:
    """Inverse of _chunk_name (reference main.py:304-311)."""
    out = {}
    for part in name.split("-"):
        bits = part.split("_")
        out[bits[0]] = [int(x) for x in bits[1:]]
    return out


def divide_data(data: np.ndarray, divide_type: str
                ) -> Tuple[List[Dict], np.ndarray]:
    """Grid split: 'total_nd_nh_nw' (number of chunks per axis) or
    'every_dsz_hsz_wsz' (chunk sizes).  Returns (chunk list, boundary-drawn
    visualisation volume) — reference utils/misc.py:329-394."""
    divide_img = copy.deepcopy(data)
    chunks: List[Dict] = []
    if data.ndim == 4:
        if "total" in divide_type:
            _, nd, nh, nw = divide_type.split("_")
            cd = int(data.shape[0] / int(nd))
            ch = int(data.shape[1] / int(nh))
            cw = int(data.shape[2] / int(nw))
        elif "every" in divide_type:
            _, cd, ch, cw = divide_type.split("_")
            cd, ch, cw = int(cd), int(ch), int(cw)
        else:
            raise NotImplementedError(divide_type)
        dsec = [i for i in range(data.shape[0]) if i % cd == 0] + [data.shape[0]]
        hsec = [i for i in range(data.shape[1]) if i % ch == 0] + [data.shape[1]]
        wsec = [i for i in range(data.shape[2]) if i % cw == 0] + [data.shape[2]]
        for di in range(len(dsec) - 1):
            for hi in range(len(hsec) - 1):
                for wi in range(len(wsec) - 1):
                    chunks.append({
                        "data": data[dsec[di]:dsec[di + 1],
                                     hsec[hi]:hsec[hi + 1],
                                     wsec[wi]:wsec[wi + 1]],
                        "d": [dsec[di], dsec[di + 1] - 1],
                        "h": [hsec[hi], hsec[hi + 1] - 1],
                        "w": [wsec[wi], wsec[wi + 1] - 1]})
                    z, y, x = dsec[di], hsec[hi], wsec[wi]
                    d = dsec[di + 1] - dsec[di]
                    h = hsec[hi + 1] - hsec[hi]
                    w = wsec[wi + 1] - wsec[wi]
                    # draw boundaries (value 2000, reference misc.py:357-362)
                    divide_img[z, y:y + h, x:x + w] = 2000
                    divide_img[z + d - 1, y:y + h, x:x + w] = 2000
                    divide_img[z:z + d, y, x:x + w] = 2000
                    divide_img[z:z + d, y + h - 1, x:x + w] = 2000
                    divide_img[z:z + d, y:y + h, x] = 2000
                    divide_img[z:z + d, y:y + h, x + w - 1] = 2000
    elif data.ndim == 3:
        if "total" in divide_type:
            _, _, nh, nw = divide_type.split("_")
            ch = int(data.shape[0] / int(nh))
            cw = int(data.shape[1] / int(nw))
        elif "every" in divide_type:
            _, _, ch, cw = divide_type.split("_")
            ch, cw = int(ch), int(cw)
        else:
            raise NotImplementedError(divide_type)
        hsec = [i for i in range(data.shape[0]) if i % ch == 0] + [data.shape[0]]
        wsec = [i for i in range(data.shape[1]) if i % cw == 0] + [data.shape[1]]
        for hi in range(len(hsec) - 1):
            for wi in range(len(wsec) - 1):
                chunks.append({
                    "data": data[hsec[hi]:hsec[hi + 1], wsec[wi]:wsec[wi + 1]],
                    "h": [hsec[hi], hsec[hi + 1] - 1],
                    "w": [wsec[wi], wsec[wi + 1] - 1]})
                try:
                    import cv2
                    cv2.rectangle(divide_img, (wsec[wi], hsec[hi]),
                                  (wsec[wi + 1], hsec[hi + 1]), (0, 0, 255), 2)
                except Exception:
                    pass
    else:
        raise NotImplementedError(data.shape)
    for chunk in chunks:
        chunk["total_size"] = data.size
        chunk["size"] = chunk["data"].size
        chunk["name"] = _chunk_name(chunk)
    return chunks, divide_img


def cal_factor(n: int) -> List[int]:
    """All proper divisors of n including 1 (reference
    adaptive_blocking.py:425-430)."""
    return [1] + [i for i in range(2, n) if n % i == 0]


def cal_divide_num(d: int, h: int, w: int, Nb: int, param_size: float
                   ) -> np.ndarray:
    """Pick (nd, nh, nw) dividing the volume into at most Nb near-cubic
    chunks (reference adaptive_blocking.py:432-460).  Nb <= 0 defaults to
    param_size/(4*1361) — the mean SIREN block size heuristic."""
    if Nb <= 0:
        Nb = max(1, int(param_size / (4 * 1361)))
    best_num, best = 0, None
    best_var = None
    for nd in cal_factor(d):
        for nh in cal_factor(h):
            for nw in cal_factor(w):
                num = nd * nh * nw
                if num > Nb:
                    continue
                size = np.array([d / nd, h / nh, w / nw])
                var = ((size - size.mean()) ** 2).mean()
                if num > best_num or (num == best_num and var < best_var):
                    best_num, best, best_var = num, np.array([nd, nh, nw]), var
    return best


def alloc_param(chunks: List[Dict], param_size: float, param_alloc: str,
                param_size_thres: float) -> List[Dict]:
    """Split a byte budget across chunks; drop sub-threshold chunks and
    re-allocate recursively (reference utils/misc.py:395-428).

    Modes: 'equal', 'by_size', 'by_var' (variance share), 'by_d'
    (1/FFT-sharpness share), 'by_dv' (size/FFT-sharpness share).
    """
    if param_alloc == "equal":
        for c in chunks:
            c["param_size"] = param_size / len(chunks)
    elif param_alloc == "by_size":
        for c in chunks:
            c["param_size"] = param_size * c["size"] / c["total_size"]
    elif param_alloc == "by_var":
        tot = sum(float(((c["data"] - c["data"].mean()) ** 2).mean())
                  for c in chunks)
        for c in chunks:
            var = float(((c["data"] - c["data"].mean()) ** 2).mean())
            c["param_size"] = float(param_size * var / tot)
    elif param_alloc == "by_d":
        tot = sum(1.0 / cal_feature(c["data"]) for c in chunks)
        for c in chunks:
            c["param_size"] = float(param_size * (1.0 / cal_feature(c["data"])) / tot)
    elif param_alloc == "by_dv":
        tot = sum(c["size"] / cal_feature(c["data"]) for c in chunks)
        for c in chunks:
            c["param_size"] = float(
                param_size * (c["size"] / cal_feature(c["data"])) / tot)
    else:
        raise NotImplementedError(param_alloc)
    kept = [c for c in chunks if c["param_size"] >= param_size_thres]
    if len(kept) < len(chunks):
        return alloc_param(kept, param_size, param_alloc, param_size_thres)
    return kept


def merge_divided_data(chunks: List[Dict], data_shape) -> np.ndarray:
    """Sum decoded chunks into a zero volume, clip to dtype max, cast
    (reference utils/misc.py:430-445)."""
    from brief_pytorch_tpu.core.normalize import get_type_max
    mx = get_type_max(chunks[0]["data"])
    out = np.zeros(tuple(data_shape), dtype=np.float32)
    for c in chunks:
        h0, h1 = c["h"]
        w0, w1 = c["w"]
        if len(data_shape) == 4:
            d0, d1 = c["d"]
            out[d0:d1 + 1, h0:h1 + 1, w0:w1 + 1] += c["data"]
        elif len(data_shape) == 3:
            out[h0:h1 + 1, w0:w1 + 1] += c["data"]
        else:
            raise NotImplementedError(data_shape)
    out = out.clip(None, mx)
    return out.astype(chunks[0]["data"].dtype)
