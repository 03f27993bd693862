"""High-level TensorBoard Logger facade (reference:
src/util/tensorboard_logger.py:14-75, minus the tensorflow dependency).

log_scalar / log_histogram go through the native-or-python EventWriter;
log_plots rasterizes matplotlib figures into TB image summaries.
"""

import io
import struct
import time

import numpy as np

from .tb_writer import (
    EventWriter,
    _encode_event,
    _pb_bytes,
    _pb_int64,
    _tag,
    _varint,
)


def _image_summary(tag: str, png: bytes, height: int, width: int) -> bytes:
    img = (
        _pb_int64(1, height)
        + _pb_int64(2, width)
        + _pb_int64(3, 4)  # colorspace RGBA
        + _pb_bytes(4, png)
    )
    v = _pb_bytes(1, tag.encode()) + _pb_bytes(4, img)
    return _pb_bytes(1, v)


class Logger:
    """Scalar/histogram/figure logging to TensorBoard event files."""

    def __init__(self, log_dir: str):
        self.writer = EventWriter(log_dir)
        # images always go through the python framing path
        self._py = EventWriter(log_dir + "/images", prefer_native=False)

    def log_scalar(self, tag, value, step):
        self.writer.scalar(tag, float(value), int(step))

    def log_histogram(self, tag, values, step, bins=30):
        self.writer.histogram(tag, np.asarray(values), int(step), bins=bins)

    def log_plots(self, tag, figures, step):
        try:
            import matplotlib.pyplot as plt  # noqa: F401
        except Exception:
            return
        for i, fig in enumerate(figures):
            buf = io.BytesIO()
            fig.canvas.draw()
            w, h = fig.canvas.get_width_height()
            fig.savefig(buf, format="png")
            summary = _image_summary(f"{tag}/{i}", buf.getvalue(), h, w)
            self._py._write_record(
                _encode_event(time.time(), int(step), summary=summary)
            )

    def close(self):
        self.writer.close()
        self._py.close()
