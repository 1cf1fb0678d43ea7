"""Native C++ runtime: high-rate RTP I/Q engine (rtp_engine.cc).

Compiled on demand with g++ (no pybind11 in this environment; plain C ABI
via ctypes).  `RTPReceiver` produces dense packed-float32 blocks ready for
the device's real-dtype jit boundary; `RTPSender` paces int16 I/Q at wire
rate.  Falls back gracefully: NATIVE_AVAILABLE is False if no compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "NATIVE_AVAILABLE", "RTPReceiver", "RTPSender", "PCMFanoutSender",
    "NativeOpusTranscoder", "build",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rtp_engine.cc")
_SO = os.path.join(_DIR, "librtp_engine.so")

_lib = None
_lock = threading.Lock()


def build(force: bool = False) -> bool:
    """Compile the engine if needed.  Returns success.

    Compiles to a temp file and atomically renames onto the .so: the
    multi-process constellation can trigger this rebuild in several
    processes at once after an rtp_engine.cc edit, and a sibling must
    never dlopen a half-written library (rename(2) is atomic; a loser of
    the race just replaces the winner's identical output)."""
    if not force and os.path.exists(_SO) and (
        os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return True
    tmp = f"{_SO}.build.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", tmp, _SRC, "-lpthread", "-ldl",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not build():
            raise OSError("cannot build librtp_engine.so")
        lib = ctypes.CDLL(_SO)
        lib.rtp_parse_probe.restype = ctypes.c_int
        lib.rtp_parse_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.rtp_rx_create.restype = ctypes.c_void_p
        lib.rtp_rx_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.rtp_rx_get_block.restype = ctypes.c_int
        lib.rtp_rx_get_block.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.rtp_rx_get_block_i16.restype = ctypes.c_int
        lib.rtp_rx_get_block_i16.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
        ]
        lib.rtp_rx_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.rtp_rx_destroy.argtypes = [ctypes.c_void_p]
        lib.rtp_tx_create.restype = ctypes.c_void_p
        lib.rtp_tx_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_uint,
        ]
        lib.rtp_tx_send.restype = ctypes.c_int
        lib.rtp_tx_send.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.rtp_tx_destroy.argtypes = [ctypes.c_void_p]
        lib.pcm_tx_create.restype = ctypes.c_void_p
        lib.pcm_tx_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.pcm_tx_send_block.restype = ctypes.c_longlong
        lib.pcm_tx_send_block.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pcm_tx_destroy.argtypes = [ctypes.c_void_p]
        lib.pcm_tx_set_ssrc.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint,
        ]
        lib.opus_tx_create.restype = ctypes.c_void_p
        lib.opus_tx_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.opus_tx_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.opus_tx_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


try:
    NATIVE_AVAILABLE = build()
except Exception:
    NATIVE_AVAILABLE = False


def _resolve_group(group: str) -> str:
    """First numeric form of `group` (see _resolve_candidates)."""
    return _resolve_candidates(group)[0]


def _resolve_candidates(group: str) -> list[str]:
    """Resolve a hostname or literal to the numeric forms the C engine's
    AI_NUMERICHOST getaddrinfo accepts — dual-stack, ALL results in
    getaddrinfo order so callers can try each family like the reference's
    PF_UNSPEC loop (multicast.c:173-201; a v6-first name on a v4-only
    path must fall through to its A record, as setup_mcast does).  IPv6
    zone suffixes (%eth0) pass through; the zone getaddrinfo returns
    separately (sa[3]) is reattached numerically."""
    import socket as _socket

    try:
        infos = _socket.getaddrinfo(
            group, None, _socket.AF_UNSPEC, _socket.SOCK_DGRAM)
    except OSError as e:
        raise OSError(f"cannot resolve multicast group {group!r}: {e}")
    out: list[str] = []
    for family, _, _, _, sa in infos:
        host = sa[0]
        if family == _socket.AF_INET6 and sa[3] and "%" not in host:
            host = f"{host}%{sa[3]}"
        if host not in out:
            out.append(host)
    return out


def parse_probe(data: bytes):
    """Test-only: run the native wire parser on a datagram.  Returns
    (version, type, seq, timestamp, ssrc, marker, payload_offset,
    pad_len) or None if the engine would drop it as malformed — for
    differential fuzzing against net.rtp.RTPHeader.from_bytes +
    rtp_payload (pad_len encodes the padding-strip semantics)."""
    lib = _load()
    out = (ctypes.c_longlong * 8)()
    if not lib.rtp_parse_probe(data, len(data), out):
        return None
    return tuple(int(v) for v in out)


class RTPReceiver:
    """Native multicast I/Q receive engine -> dense packed float blocks.

    get_block() returns an (L, 2) float32 array (or None on timeout) —
    exactly the device's jit-boundary input format."""

    def __init__(
        self,
        group: str,
        port: int = 5004,
        block_len: int = 3840,
        skip_legacy: bool = True,
        ring_blocks: int = 64,
    ):
        self._lib = _load()
        self.block_len = block_len
        # resolve hostnames host-side (dual-stack); the C engine takes
        # numeric literals only and fails LOUDLY instead of falling back
        # to a deaf INADDR_ANY bind.  Try each resolved family in order
        # (the reference's PF_UNSPEC loop): a v6-first name whose v6
        # bind fails must fall through to its A record.
        self._h = None
        for cand in _resolve_candidates(group):
            self._h = self._lib.rtp_rx_create(
                cand.encode(), port, block_len, int(skip_legacy),
                ring_blocks
            )
            if self._h:
                break
        if not self._h:
            raise OSError(f"rtp_rx_create failed for {group}:{port} "
                          "(bad group address, bind, or membership)")

    def get_block(self, timeout_ms: int = 1000):
        out = np.empty((self.block_len, 2), np.float32)
        r = self._lib.rtp_rx_get_block(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            timeout_ms,
        )
        return out if r else None

    def get_block_i16(self, timeout_ms: int = 1000):
        """Raw (L, 2) int16 block — the preferred ingest path: half the
        host->device bytes, converted on-chip (~36% faster per block)."""
        out = np.empty((self.block_len, 2), np.int16)
        r = self._lib.rtp_rx_get_block_i16(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            timeout_ms,
        )
        return out if r else None

    def stats(self) -> dict:
        buf = (ctypes.c_longlong * 6)()
        self._lib.rtp_rx_stats(self._h, buf)
        return dict(
            zip(
                ("packets", "drops", "dupes", "gap_samples", "overruns",
                 "blocks"),
                list(buf),
            )
        )

    def close(self):
        if self._h:
            self._lib.rtp_rx_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PCMFanoutSender:
    """Native multichannel PCM RTP fan-out (audio.c semantics per channel,
    batched for the bank): one call per bank block sends every active
    channel's big-endian PCM with silence suppression, talk-spurt markers
    and per-channel SSRC/seq/timestamp state.  ~128 packets per 20 ms at
    64 active channels — done in C so the 1-core host's Python loop only
    dispatches blocks."""

    def __init__(
        self,
        group: str,
        port: int = 5004,
        ttl: int = 1,
        ssrc_base: int = 1,
        max_channels: int = 4096,
        channels: int = 1,
    ):
        self._lib = _load()
        self._h = None
        for cand in _resolve_candidates(group):
            self._h = self._lib.pcm_tx_create(
                cand.encode(), port, ttl, ssrc_base, max_channels, channels
            )
            if self._h:
                break
        if not self._h:
            raise OSError(f"pcm_tx_create failed for {group}:{port}")
        self.channels = channels

    def send_block(
        self,
        pcm_i16: np.ndarray,
        ch_ids: np.ndarray | None = None,
        pkt_samples: int = 480,
    ) -> int:
        """pcm_i16: (n_rows, block_len[, channels]) host-order int16 — the
        device's compacted PCM output.  ch_ids: (n_rows,) int32 logical
        channel per row, -1 = unused slot (bank_step_active's idx); None
        means row i IS channel i.  Returns packets sent."""
        arr = np.ascontiguousarray(pcm_i16, np.int16)
        n_rows = arr.shape[0]
        block_len = arr.shape[1]
        if ch_ids is None:
            ch_ids = np.arange(n_rows, dtype=np.int32)
        ids = np.ascontiguousarray(ch_ids, np.int32)
        return int(self._lib.pcm_tx_send_block(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_rows, block_len, pkt_samples,
        ))

    def set_ssrc(self, ch: int, ssrc: int) -> None:
        """Override slot ch's wire SSRC (live mode migration: the slot
        adopts the migrating channel's SSRC; its output stream restarts
        like the reference's respawned demod thread, radio.c:322-374).
        ssrc=0 restores the default base+slot mapping."""
        self._lib.pcm_tx_set_ssrc(self._h, ch, ssrc)

    def close(self):
        if self._h:
            self._lib.pcm_tx_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeOpusTranscoder:
    """Fully native PCM->Opus multicast transcoder (opus.c main loop).

    The Python path (audio/transcode.py) costs ~193 us/packet on this
    1-core host; 64 active channels at the 20 ms cadence is 62% of the
    core, which can't share it with bankd.  This engine runs recvmmsg,
    session demux, resequencing, encode and send in one C++ thread, so
    only libopus itself (~115 us/frame) remains.  Semantics are
    differential-tested against the Python transcoder (test_native.py)."""

    def __init__(
        self,
        input_group: str,
        output_group: str,
        input_port: int = 5004,
        output_port: int = 5004,
        bitrate: int = 32000,
        frame_ms: float = 20.0,
        dtx: bool = False,
        fec: int = 0,
        ttl: int = 1,
        max_sessions: int = 1024,
        complexity: int = -1,
    ):
        from ..audio.transcode import LEGAL_FRAMES_MS
        if frame_ms not in LEGAL_FRAMES_MS:
            raise ValueError(f"illegal Opus frame {frame_ms} ms")
        self._lib = _load()
        self._h = None
        for in_cand in _resolve_candidates(input_group):
            for out_cand in _resolve_candidates(output_group):
                self._h = self._lib.opus_tx_create(
                    in_cand.encode(), input_port, out_cand.encode(),
                    output_port, bitrate, int(48000 * frame_ms / 1000),
                    int(dtx), fec, ttl, max_sessions, complexity,
                )
                if self._h:
                    break
            if self._h:
                break
        if not self._h:
            raise OSError(
                f"opus_tx_create failed ({input_group}:{input_port} -> "
                f"{output_group}:{output_port}; libopus present?)"
            )

    def stats(self) -> dict:
        buf = (ctypes.c_longlong * 7)()
        self._lib.opus_tx_stats(self._h, buf)
        return dict(
            zip(
                ("packets_in", "packets_out", "frames", "sessions", "dupes",
                 "resets", "rejected"),
                list(buf),
            )
        )

    def close(self):
        if self._h:
            self._lib.opus_tx_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RTPSender:
    """Native paced I/Q sender (iqplay's loop at wire rate)."""

    def __init__(
        self,
        group: str,
        port: int = 5004,
        samprate: int = 192000,
        frequency: float = 0.0,
        ttl: int = 1,
        ssrc: int = 0,
    ):
        self._lib = _load()
        self._h = None
        for cand in _resolve_candidates(group):
            self._h = self._lib.rtp_tx_create(
                cand.encode(), port, samprate, frequency, ttl, ssrc or 1
            )
            if self._h:
                break
        if not self._h:
            raise OSError(f"rtp_tx_create failed for {group}:{port}")

    def send(self, iq_int16: np.ndarray, pkt_samples: int = 240,
             realtime: bool = True) -> int:
        """iq_int16: interleaved (2n,) int16.  Returns packets sent."""
        arr = np.ascontiguousarray(iq_int16, np.int16)
        return self._lib.rtp_tx_send(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            len(arr) // 2, pkt_samples, int(realtime),
        )

    def close(self):
        if self._h:
            self._lib.rtp_tx_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
