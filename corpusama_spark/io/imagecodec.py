"""Minimal deterministic image codecs (pure stdlib; no PIL in this sandbox).

The engine treats images as opaque ``binary`` cells decoded only inside Arrow
batches (the reference's analogous slot is PDF bytes decoded with PyMuPDF,
corpusama/source/pdf.py:36-64). Three codecs:

- ``png``: a real, spec-compliant subset codec (8-bit RGB, filter 0,
  zlib-compressed) — encode and decode round-trip losslessly, so any PNG
  library can read our synthetic images and PSNR is infinite.
- ``jpeg`` / ``webp``: STAND-INS for the lossy formats. The container has no
  image libraries, so these use a deterministic quantization codec ("qimg"):
  pixels quantized to ``QUANT_STEP`` levels, zlib-compressed, wrapped with a
  magic header carrying (fmt, w, h). Quantization makes them genuinely lossy
  (PSNR finite but >= 40 dB for the default step), exercising the
  PSNR-threshold invariant for real. Swapping in PIL/libvips decode is a
  one-function change (`decode_image`), gated behind an import-try.

All functions raise ValueError on corrupt input; callers convert that into
``keep=false, drop_reason='image_corrupt'`` (mirrors the tolerated-failure
path in the reference, corpusama/source/pdf.py:91-105, test_pdf.py:41-47).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
QIMG_MAGIC = b"QIMG"
QUANT_STEP = 4  # lossy quantization step for the jpeg/webp stand-in codec

try:  # real decoders if ever available in the runtime image
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover - sandbox has no PIL
    HAVE_PIL = False


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB8 PNG."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    if ftype == 0:
        return line
    out = line.astype(np.int32)
    if ftype == 2:  # Up
        return ((out + prev) % 256).astype(np.uint8)
    n = len(line)
    res = np.empty(n, dtype=np.uint8)
    for i in range(n):
        a = int(res[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        if ftype == 1:  # Sub
            val = line[i] + a
        elif ftype == 3:  # Average
            val = line[i] + (a + b) // 2
        elif ftype == 4:  # Paeth
            cc = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            val = line[i] + pred
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        res[i] = val % 256
    return res


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG (any of the 5 scanline filters) to (h, w, 3) uint8."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (
            zlib.crc32(tag + payload) & 0xFFFFFFFF
        ):
            raise ValueError("PNG chunk CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only RGB8 PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"bad PNG deflate stream: {exc}") from exc
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("bad PNG payload size")
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    if not flat[:, 0].any():
        # filter-0 fast path (what our encoder writes): drop the filter
        # column and reshape — no per-scanline loop
        return np.ascontiguousarray(flat[:, 1:]).reshape(h, w, 3)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        out[y] = _unfilter(int(flat[y, 0]), flat[y, 1:], prev, 3)
        prev = out[y]
    return out.reshape(h, w, 3)


def encode_qimg(arr: np.ndarray, fmt: str, step: int = QUANT_STEP) -> bytes:
    """Lossy stand-in encoder for 'jpeg'/'webp' (quantize + zlib)."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_qimg expects (h, w, 3) uint8")
    q = (arr.astype(np.uint16) // step).astype(np.uint8)
    header = QIMG_MAGIC + fmt[:4].ljust(4).encode() + struct.pack(">IIB", w, h, step)
    return header + zlib.compress(q.tobytes(), 6)


def decode_qimg(data: bytes) -> np.ndarray:
    if data[:4] != QIMG_MAGIC:
        raise ValueError("not a QIMG container")
    try:
        w, h, step = struct.unpack(">IIB", data[8:17])
        raw = zlib.decompress(data[17:])
    except (struct.error, zlib.error) as exc:
        raise ValueError(f"bad QIMG stream: {exc}") from exc
    if len(raw) != h * w * 3:
        raise ValueError("bad QIMG payload size")
    q = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers
    return np.minimum(q.astype(np.uint16) * step + step // 2, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode image bytes per declared format; ValueError on corruption.

    With PIL present this would route jpeg/webp through ``Image.open``; in this
    sandbox the qimg stand-in keeps all Spark-side plumbing (schemas, batch
    shapes, PSNR math) real.
    """
    if data is None:
        raise ValueError("null image bytes")
    if fmt == "png":
        return decode_png(bytes(data))
    if fmt in ("jpeg", "webp"):
        if bytes(data)[:4] != QIMG_MAGIC:
            if HAVE_PIL:  # pragma: no cover - exercised by tests/test_optional
                import io

                from PIL import Image

                try:
                    with Image.open(io.BytesIO(bytes(data))) as im:
                        return np.asarray(im.convert("RGB"))
                except Exception as exc:
                    raise ValueError(f"undecodable {fmt}: {exc}") from None
            raise ValueError(f"not a QIMG payload and no {fmt} codec present")
        return decode_qimg(bytes(data))
    raise ValueError(f"unknown image format {fmt!r}")


def roundtrip_lossy(
    arr: np.ndarray, fmt: str, step: int = QUANT_STEP, real: bool = False
) -> np.ndarray:
    """Pixels after an encode→decode roundtrip in the declared lossy format.

    For the qimg stand-in the loss is EXACTLY bin-center quantization —
    the zlib serialize/deserialize in between is lossless and adds no
    information — so the roundtrip is computed analytically (test-pinned
    byte-equal to decode_qimg(encode_qimg(arr))): the verify stage skips
    one zlib compress + decompress of w*h*3 bytes per image. With
    ``real=True`` (a PIL-decoded genuine jpeg/webp) the actual encoder
    must run — no analytic shortcut exists for real DCT codecs.
    """
    if real:  # pragma: no cover - exercised by tests/test_optional
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(
            buf, format="JPEG" if fmt == "jpeg" else "WEBP", quality=90
        )
        with Image.open(buf) as im:
            return np.asarray(im.convert("RGB"))
    q = (arr.astype(np.uint16) // step).astype(np.uint8)
    return np.minimum(q.astype(np.uint16) * step + step // 2, 255).astype(
        np.uint8
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    if a.shape != b.shape:
        raise ValueError("shape mismatch")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(255.0) - 10 * np.log10(mse))
