"""Capture stage: VDIF frame streams -> gap-filled, 1-s-aligned seconds.

The writer role (ref src/writer.c:344-800): consume VDIF frames (live UDP or
replayed from disk, the readbase role ref src/readbase.c:35-107), detect
drops via frame arithmetic, synthesize zero-filled frames for gaps (zero is
the unpack flag value, ops/unpack.py), align output to 1-second boundaries
(thread 0 frame 0), and emit (npol, sample_rate) uint8 second-buffers into
the baseband ring.

Unlike the reference's raw PF_PACKET capture (src/utils.c:345-407) this uses
portable UDP sockets — TPU hosts are not on the VLA fiber; the wire format
(one VDIF frame per datagram) is preserved.
"""

from __future__ import annotations

import socket
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from vlite_fast_tpu import constants as C
from vlite_fast_tpu.utils import vdif


@dataclass
class CaptureStats:
    """Escalating counters (ref src/writer.c:32-37,616-672)."""

    frames: int = 0
    skipped: int = 0
    anomalous: int = 0
    seconds: int = 0
    skip_warn: int = 1000
    skip_abort: int = 50000

    def healthy(self) -> bool:
        return self.skipped < self.skip_abort


class SecondAssembler:
    """Assemble a dual-pol frame stream into whole seconds.

    Feed frames in arrival order; emits (second, samples[2, rate]) once a
    second completes (a frame of a later second arrives).  Missing frames
    stay zero (gap-fill, ref src/writer.c:674-687).
    """

    def __init__(self, sample_rate: int = C.VLITE_RATE):
        self.sample_rate = sample_rate
        self.frames_per_sec = sample_rate // C.VDIF_DATA_BYTES
        self.stats = CaptureStats()
        self._current_sec: Optional[int] = None
        self._buf = np.zeros((2, sample_rate), dtype=np.uint8)
        self._filled = 0
        self._started = False
        self.ref_epoch = 0

    def _flush(self):
        out = (self._current_sec, self._buf)
        self._buf = np.zeros((2, self.sample_rate), dtype=np.uint8)
        self._filled = 0
        return out

    def feed(self, seconds: int, frame: int, thread: int,
             payload: np.ndarray):
        """Feed one frame; yields completed (second, samples) tuples."""
        done = []
        if not self._started:
            # wait for a 1 s boundary: thread 0, frame 0 (ref writer.c:694)
            if frame != 0:
                return done
            self._started = True
            self._current_sec = seconds
        if seconds != self._current_sec:
            if seconds < self._current_sec:
                self.stats.anomalous += 1
                return done
            while self._current_sec < seconds:
                done.append(self._flush())
                self.stats.seconds += 1
                self._current_sec += 1
        pol = 1 if thread != 0 else 0
        off = frame * C.VDIF_DATA_BYTES
        n = min(C.VDIF_DATA_BYTES, self.sample_rate - off)
        if n <= 0:
            self.stats.anomalous += 1
            return done
        self._buf[pol, off:off + n] = payload[:n]
        self._filled += 1
        self.stats.frames += 1
        return done

    def flush(self) -> list:
        """End-of-stream: emit the in-progress second (replay only; live
        capture flushes on the next second's first frame)."""
        if not self._started or self._filled == 0:
            return []
        out = [self._flush()]
        self.stats.seconds += 1
        self._current_sec += 1
        return out

    def feed_stream(self, raw: np.ndarray):
        """Feed a contiguous byte stream of frames; yields completed secs."""
        frame_bytes = C.VDIF_FRAME_BYTES
        raw = np.asarray(raw, dtype=np.uint8)
        nframes = raw.size // frame_bytes
        frames = raw[:nframes * frame_bytes].reshape(nframes, frame_bytes)
        fields = vdif.parse_headers(frames[:, :C.VDIF_HEADER_BYTES])
        if nframes:
            self.ref_epoch = int(fields["ref_epoch"][0])
        done = []
        for i in range(nframes):
            done.extend(self.feed(int(fields["seconds"][i]),
                                  int(fields["frame"][i]),
                                  int(fields["thread_id"][i]),
                                  frames[i, C.VDIF_HEADER_BYTES:]))
        return done


def to_unix(vdif_seconds: int, ref_epoch: int) -> float:
    """VDIF (ref_epoch, seconds) -> unix seconds (the vdif_to_unixepoch
    conversion every downstream timestamp uses, ref src/utils.c:498-521)."""
    return float(vdif._epoch_unix(ref_epoch)) + float(vdif_seconds)


def replay_file(path: str, chunk_frames: int = 4096,
                sample_rate: int = C.VLITE_RATE) -> Iterator[tuple]:
    """readbase equivalent: stream completed seconds from a recorded .vdif
    dump (ref src/readbase.c:35-107, scripts/readbase_test).
    Yields (unix_second, samples, ref_epoch)."""
    asm = SecondAssembler(sample_rate=sample_rate)
    with open(path, "rb") as fp:
        while True:
            raw = fp.read(chunk_frames * C.VDIF_FRAME_BYTES)
            if not raw:
                break
            for sec, buf in asm.feed_stream(np.frombuffer(raw, np.uint8)):
                yield to_unix(sec, asm.ref_epoch), buf, asm.ref_epoch
    for sec, buf in asm.flush():
        yield to_unix(sec, asm.ref_epoch), buf, asm.ref_epoch


class UDPCapture:
    """Live capture: one VDIF frame per UDP datagram -> SecondAssembler."""

    def __init__(self, host: str = "0.0.0.0", port: int = 20000,
                 sample_rate: int = C.VLITE_RATE):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                             64 * 1024 * 1024)
        self.sock.bind((host, port))
        self.sock.settimeout(0.5)
        self.asm = SecondAssembler(sample_rate)

    def poll(self, max_frames: int = 256) -> list:
        """Receive up to max_frames datagrams (the reference drains 20 per
        select wake, writer.c:611-614); returns completed
        (unix_second, samples) tuples."""
        done = []
        for _ in range(max_frames):
            try:
                pkt, _ = self.sock.recvfrom(C.VDIF_FRAME_BYTES + 64)
            except socket.timeout:
                break
            if len(pkt) < C.VDIF_FRAME_BYTES:
                self.asm.stats.anomalous += 1
                continue
            done.extend(self.asm.feed_stream(
                np.frombuffer(pkt[:C.VDIF_FRAME_BYTES], np.uint8)))
        return [(to_unix(s, self.asm.ref_epoch), b) for s, b in done]

    def close(self):
        self.sock.close()
