"""Media I/O: the Python face of the native media shim.

Replaces the reference's cv2.VideoCapture frame loops (batch_process.py:151-230),
decord batch decode (foundation_models.py:251-260), and every ffmpeg subprocess
(batch_process.py:266-308; hippocampal_memory.py:1386-1396, 3064-3078) with:

  * MJPEG-AVI via the C++ shim (libjpeg + RIFF container, threaded batch decode)
  * Y4M (uncompressed YUV4MPEG2) via numpy — frames are fixed-size so time
    seeking is pointer arithmetic; YUV→RGB conversion happens ON DEVICE
    (ops/color.py) so the host ships 1.5 B/px instead of 3 B/px
  * WAV (PCM16/PCM32/float32) via numpy, with channel downmix + linear
    resampling to 16 kHz mono

The C++ shim is compiled on first use (g++ -O3, ~1 s); PIL-based JPEG fallback
keeps everything functional if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhmm_media.so")
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "media_shim.cpp")
        ):
            subprocess.run(
                ["make", "-s", "libhmm_media.so"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hmm_jpeg_decode.restype = ctypes.c_int
        lib.hmm_jpeg_encode.restype = ctypes.c_int
        lib.hmm_jpeg_decode_batch.restype = ctypes.c_int
        lib.hmm_avi_open.restype = ctypes.c_void_p
        lib.hmm_avi_open.argtypes = [ctypes.c_char_p]
        lib.hmm_avi_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.hmm_avi_read_frames.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.hmm_avi_read_indices.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.hmm_avi_close.argtypes = [ctypes.c_void_p]
        lib.hmm_avi_writer_open.restype = ctypes.c_void_p
        lib.hmm_avi_writer_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
        ]
        lib.hmm_avi_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.hmm_avi_writer_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain always present in CI
        logger.warning("native media shim unavailable (%s); using PIL fallback", e)
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_native() is not None


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def jpeg_encode(rgb: np.ndarray, quality: int = 90) -> bytes:
    """RGB (H, W, 3) uint8 -> JPEG bytes."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    lib = _load_native()
    if lib is not None:
        cap = w * h * 3 + 65536
        out = np.empty(cap, dtype=np.uint8)
        out_len = ctypes.c_size_t(cap)
        rc = lib.hmm_jpeg_encode(
            rgb.ctypes.data_as(ctypes.c_void_p),
            w,
            h,
            quality,
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(out_len),
        )
        if rc == 0:
            return bytes(out[: out_len.value])
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB (H, W, 3) uint8."""
    lib = _load_native()
    if lib is not None:
        arr = np.frombuffer(data, dtype=np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = lib.hmm_jpeg_decode(
            arr.ctypes.data_as(ctypes.c_void_p), len(data), None, ctypes.byref(w), ctypes.byref(h)
        )
        if rc == 0:
            out = np.empty((h.value, w.value, 3), dtype=np.uint8)
            rc = lib.hmm_jpeg_decode(
                arr.ctypes.data_as(ctypes.c_void_p),
                len(data),
                out.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(w),
                ctypes.byref(h),
            )
            if rc == 0:
                return out
    import io as _io

    from PIL import Image

    return np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))


def write_jpeg(path: str, rgb: np.ndarray, quality: int = 90) -> None:
    with open(path, "wb") as f:
        f.write(jpeg_encode(rgb, quality))


def read_jpeg(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return jpeg_decode(f.read())


# ---------------------------------------------------------------------------
# WAV (PCM) — numpy, no soundfile dependency
# ---------------------------------------------------------------------------


def write_wav(path: str, pcm: np.ndarray, sample_rate: int = 16000) -> None:
    """float32 [-1,1] (N,) or (N, C) -> 16-bit PCM WAV."""
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    data = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    n, c = data.shape
    byte_rate = sample_rate * c * 2
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + n * c * 2))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, c, sample_rate, byte_rate, c * 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", n * c * 2))
        f.write(data.tobytes())


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """WAV -> (float32 (N, C), sample_rate). Supports PCM16/24/32 + float32."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a WAV file: {path}")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            payload = f.read(size + (size & 1))[:size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
            elif cid == b"data":
                data = payload
        if fmt is None or data is None:
            raise ValueError(f"malformed WAV: {path}")
        audio_fmt, channels, rate, _, _, bits = fmt
        if audio_fmt == 3 and bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            ints = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            arr = ints.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}bit")
        return arr.reshape(-1, channels), rate


def load_audio_mono16k(path: str) -> np.ndarray:
    """WAV -> 16 kHz mono float32 — the framework's canonical audio form
    (reference: ffmpeg -ar 16000 -ac 1, batch_process.py:266-290)."""
    audio, rate = read_wav(path)
    mono = audio.mean(axis=1)
    if rate != 16000:
        n_out = int(round(len(mono) * 16000 / rate))
        x_old = np.arange(len(mono)) / rate
        x_new = np.arange(n_out) / 16000.0
        mono = np.interp(x_new, x_old, mono).astype(np.float32)
    return mono.astype(np.float32)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2, 420 planar)
# ---------------------------------------------------------------------------


@dataclass
class VideoInfo:
    width: int
    height: int
    fps: float
    num_frames: int
    duration: float


class Y4MReader:
    """Uncompressed YUV420 container. Frame-exact random access by pointer
    arithmetic; returns planar YUV so color conversion can run on device."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            header = f.readline()
        if not header.startswith(b"YUV4MPEG2"):
            raise ValueError(f"not a y4m file: {path}")
        self._data_start = len(header)
        self.width = self.height = 0
        num, den = 30, 1
        for tok in header.split()[1:]:
            t = tok.decode()
            if t[0] == "W":
                self.width = int(t[1:])
            elif t[0] == "H":
                self.height = int(t[1:])
            elif t[0] == "F":
                num, den = map(int, t[1:].split(":"))
            elif t[0] == "C" and not t[1:].startswith("420"):
                raise ValueError(f"only 420 chroma supported, got {t}")
        self.fps = num / den
        self._ysize = self.width * self.height
        self._csize = (self.width // 2) * (self.height // 2)
        self._frame_bytes = len(b"FRAME\n") + self._ysize + 2 * self._csize
        total = os.path.getsize(path) - self._data_start
        self.num_frames = total // self._frame_bytes

    @property
    def info(self) -> VideoInfo:
        return VideoInfo(
            self.width, self.height, self.fps, self.num_frames, self.num_frames / self.fps
        )

    def read_yuv(self, indices: Sequence[int]):
        """Returns (Y (N,H,W), U (N,H/2,W/2), V (N,H/2,W/2)) uint8."""
        n = len(indices)
        y = np.empty((n, self.height, self.width), dtype=np.uint8)
        u = np.empty((n, self.height // 2, self.width // 2), dtype=np.uint8)
        v = np.empty_like(u)
        with open(self.path, "rb") as f:
            for i, idx in enumerate(indices):
                if not 0 <= idx < self.num_frames:
                    raise IndexError(idx)
                f.seek(self._data_start + idx * self._frame_bytes + len(b"FRAME\n"))
                buf = f.read(self._ysize + 2 * self._csize)
                y[i] = np.frombuffer(buf, np.uint8, self._ysize).reshape(
                    self.height, self.width
                )
                u[i] = np.frombuffer(
                    buf, np.uint8, self._csize, self._ysize
                ).reshape(self.height // 2, self.width // 2)
                v[i] = np.frombuffer(
                    buf, np.uint8, self._csize, self._ysize + self._csize
                ).reshape(self.height // 2, self.width // 2)
        return y, u, v

    def read_rgb(self, indices: Sequence[int]) -> np.ndarray:
        from hippomm_tpu.ops.color import yuv420_to_rgb

        y, u, v = self.read_yuv(indices)
        return np.asarray(yuv420_to_rgb(y, u, v))

    def close(self):
        pass


def _rgb_to_yuv420_np(rgb: np.ndarray):
    """Host-side BT.601 full-range RGB→YUV420 (same math as ops/color.py).

    The WRITE path is fixture/tooling code — doing it in numpy avoids shipping
    whole videos across the host↔device link just to encode a file. The READ
    path stays on device (ops/color.yuv420_to_rgb) where it feeds compute.
    """
    # 16-bit fixed-point (single-core-friendly: ~4x faster than fp32 numpy)
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    u = (-11058 * r.astype(np.int32) - 21710 * g.astype(np.int32) + 32768 * b.astype(np.int32) + (128 << 16) + 32768) >> 16
    v = (32768 * r.astype(np.int32) - 27440 * g.astype(np.int32) - 5328 * b.astype(np.int32) + (128 << 16) + 32768) >> 16

    def down2(x):
        n, h, w = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2).astype(np.uint32)
        return (x.sum(axis=(2, 4)) + 2) >> 2

    to_u8 = lambda x: np.clip(x, 0, 255).astype(np.uint8)
    return to_u8(y), to_u8(down2(np.clip(u, 0, 255))), to_u8(down2(np.clip(v, 0, 255)))


def write_y4m(path: str, frames_rgb: np.ndarray, fps: float = 30.0) -> None:
    """(N, H, W, 3) uint8 RGB -> y4m 420 file (BT.601 full-range)."""
    n, h, w, _ = frames_rgb.shape
    from fractions import Fraction

    fr = Fraction(fps).limit_denominator(1000)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fr.numerator}:{fr.denominator} Ip A1:1 C420\n".encode())
        y, u, v = _rgb_to_yuv420_np(np.asarray(frames_rgb))
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(y[i].tobytes())
            f.write(u[i].tobytes())
            f.write(v[i].tobytes())


# ---------------------------------------------------------------------------
# MJPEG-AVI via the native shim
# ---------------------------------------------------------------------------


class AviReader:
    def __init__(self, path: str):
        lib = _load_native()
        if lib is None:
            raise RuntimeError("native media shim required for AVI decode")
        self._lib = lib
        self._h = lib.hmm_avi_open(path.encode())
        if not self._h:
            raise ValueError(f"cannot open AVI: {path}")
        w = ctypes.c_int()
        hh = ctypes.c_int()
        fps = ctypes.c_double()
        nf = ctypes.c_int64()
        lib.hmm_avi_info(self._h, ctypes.byref(w), ctypes.byref(hh), ctypes.byref(fps), ctypes.byref(nf))
        self.width, self.height, self.fps = w.value, hh.value, fps.value
        self.num_frames = nf.value

    @property
    def info(self) -> VideoInfo:
        return VideoInfo(
            self.width, self.height, self.fps, self.num_frames, self.num_frames / self.fps
        )

    def read_rgb(self, indices: Sequence[int]) -> np.ndarray:
        idx = np.asarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.height, self.width, 3), dtype=np.uint8)
        rc = self._lib.hmm_avi_read_indices(
            self._h,
            idx.ctypes.data_as(ctypes.c_void_p),
            len(idx),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError(f"AVI decode failed rc={rc}")
        return out

    def close(self):
        if self._h:
            self._lib.hmm_avi_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_avi(path: str, frames_rgb: np.ndarray, fps: float = 30.0, quality: int = 90) -> None:
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native media shim required for AVI encode")
    n, h, w, _ = frames_rgb.shape
    wh = lib.hmm_avi_writer_open(path.encode(), w, h, float(fps), quality)
    if not wh:
        raise RuntimeError(f"cannot open AVI writer: {path}")
    frames_rgb = np.ascontiguousarray(frames_rgb, dtype=np.uint8)
    try:
        for i in range(n):
            rc = lib.hmm_avi_writer_write(wh, frames_rgb[i].ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise RuntimeError(f"AVI encode failed rc={rc}")
    finally:
        rc = lib.hmm_avi_writer_close(wh)
        if rc != 0:
            raise RuntimeError(f"AVI finalize failed rc={rc}")


# ---------------------------------------------------------------------------
# Unified video interface (the decode shim facade)
# ---------------------------------------------------------------------------


def open_video(path: str):
    """Returns a reader with .info and .read_rgb(indices)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".y4m":
        return Y4MReader(path)
    if ext == ".avi":
        return AviReader(path)
    raise ValueError(
        f"unsupported video container: {ext} (supported: .y4m, .avi[MJPEG])"
    )


def probe_video(path: str) -> VideoInfo:
    r = open_video(path)
    try:
        return r.info
    finally:
        r.close()


def sample_indices_at_fps(info: VideoInfo, target_fps: float) -> List[int]:
    """Frame indices approximating uniform target_fps sampling."""
    if target_fps <= 0 or target_fps >= info.fps:
        return list(range(info.num_frames))
    step = info.fps / target_fps
    idx = np.round(np.arange(0, info.num_frames, step)).astype(int)
    return sorted(set(int(i) for i in idx if i < info.num_frames))


def read_frames_at_times(path: str, times: Sequence[float]) -> np.ndarray:
    """Decode the frames nearest the given timestamps (replaces the reference's
    CAP_PROP_POS_MSEC seek loops, hippocampal_memory.py:2210-2251)."""
    r = open_video(path)
    try:
        idx = [min(r.info.num_frames - 1, max(0, int(round(t * r.info.fps)))) for t in times]
        return r.read_rgb(idx)
    finally:
        r.close()
