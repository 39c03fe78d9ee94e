"""Dependency-free TensorBoard event-file writer.

The reference logs scalars and image grids through
torch.utils.tensorboard.SummaryWriter
(/root/reference/xdiffusion/training/image/train.py:11,90-95,389). This is
the TPU-runtime equivalent with zero torch/tensorflow dependency: the
tfevents wire format is small enough to emit directly —

- a TFRecord stream: [uint64 length LE][masked crc32c(length)][payload]
  [masked crc32c(payload)], crc32c = Castagnoli polynomial, masked with
  the TensorFlow rotate+add constant;
- each payload a hand-encoded `Event` protobuf (wall_time, step, and a
  `Summary` holding tagged simple_value floats or PNG-encoded images).

Files written here load in stock TensorBoard and anything else that reads
the event format (verified against the installed tensorboard reader in
tests/test_tensorboard.py).
"""

from __future__ import annotations

import io
import os
import socket
import struct
import time
from typing import Optional

import numpy as np

# --- crc32c (Castagnoli, reflected poly 0x82F63B78), table-driven -------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
            table.append(crc)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for byte in data:
        crc = table[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf wire encoding ------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _field_varint(num: int, value: int) -> bytes:
    return _varint((num << 3) | 0) + _varint(value)


def _field_double(num: int, value: float) -> bytes:
    return _varint((num << 3) | 1) + struct.pack("<d", value)


def _field_float(num: int, value: float) -> bytes:
    return _varint((num << 3) | 5) + struct.pack("<f", value)


def _field_bytes(num: int, value: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(value)) + value


def _summary_value_scalar(tag: str, value: float) -> bytes:
    # Summary.Value: tag = field 1 (string), simple_value = field 2 (float)
    return _field_bytes(1, tag.encode()) + _field_float(2, float(value))


def _summary_value_image(tag: str, png: bytes, h: int, w: int, c: int) -> bytes:
    # Summary.Image: height=1, width=2, colorspace=3, encoded = field 4
    img = (
        _field_varint(1, h)
        + _field_varint(2, w)
        + _field_varint(3, c)
        + _field_bytes(4, png)
    )
    # Summary.Value: tag = field 1, image = field 4 (message)
    return _field_bytes(1, tag.encode()) + _field_bytes(4, img)


def _event(step: int, summary_value: Optional[bytes] = None,
           file_version: Optional[str] = None) -> bytes:
    # Event: wall_time=1 (double), step=2 (int64), file_version=3
    # (string), summary=5 (Summary message; Summary.value = field 1).
    ev = _field_double(1, time.time()) + _field_varint(2, int(step))
    if file_version is not None:
        ev += _field_bytes(3, file_version.encode())
    if summary_value is not None:
        ev += _field_bytes(5, _field_bytes(1, summary_value))
    return ev


class TensorBoardWriter:
    """SummaryWriter-shaped scalar/image event logger."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.{os.getpid()}.v2"
        )
        self._file = open(os.path.join(logdir, fname), "ab")
        self._write_record(_event(0, file_version="brain.Event:2"))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._file.write(header)
        self._file.write(struct.pack("<I", _masked_crc(header)))
        self._file.write(payload)
        self._file.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(
            _event(step, _summary_value_scalar(tag, value))
        )

    def add_image(self, tag: str, image: np.ndarray, step: int) -> None:
        """image: (H, W, C) float in [0, 1] or uint8; C in {1, 3, 4}."""
        from PIL import Image

        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)
        h, w, c = image.shape
        pil = Image.fromarray(image[..., 0], mode="L") if c == 1 else (
            Image.fromarray(image)
        )
        buf = io.BytesIO()
        pil.save(buf, format="PNG")
        self._write_record(
            _event(step, _summary_value_image(tag, buf.getvalue(), h, w, c))
        )

    def flush(self) -> None:
        self._file.flush()

    def close(self) -> None:
        self._file.close()
