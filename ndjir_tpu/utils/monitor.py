"""Flat-file training monitors (nnabla Monitor-family equivalent).

Writes ``<name>.series.txt`` lines ``<index> <value>`` and PNG image dumps,
matching the reference's observability surface (reference: train.py:53-72,
SURVEY.md section 5) so existing plotting scripts keep working.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

logger = logging.getLogger("ndjir_tpu")
if not logger.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter("%(asctime)s [ndjir_tpu] %(message)s"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)


class Monitor:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)


class MonitorSeries:
    def __init__(self, name: str, monitor: Monitor, interval: int = 1,
                 verbose: bool = True):
        self.name = name
        self.interval = interval
        self.verbose = verbose
        self.fpath = os.path.join(monitor.path,
                                  name.replace(" ", "-") + ".series.txt")

    def add(self, index: int, value):
        if index % self.interval != 0:
            return
        v = float(np.asarray(value))
        with open(self.fpath, "a") as f:
            f.write(f"{index} {v:.8g}\n")
        if self.verbose:
            logger.info(f"{self.name}={v:.6g} at {index}")


class MonitorTimeElapsed:
    def __init__(self, name: str, monitor: Monitor, interval: int = 1):
        self.name = name
        self.interval = interval
        self.fpath = os.path.join(monitor.path,
                                  name.replace(" ", "-") + ".timer.txt")
        self._start = time.time()
        self._last = self._start

    def add(self, index: int):
        if index % self.interval != 0:
            return
        now = time.time()
        with open(self.fpath, "a") as f:
            f.write(f"{index} {now - self._last:.4f} {now - self._start:.4f}\n")
        self._last = now


class MonitorImage:
    def __init__(self, name: str, monitor: Monitor, interval: int = 1):
        self.name = name
        self.interval = interval
        self.dir = os.path.join(monitor.path, name.replace(" ", "-"))
        os.makedirs(self.dir, exist_ok=True)

    def add(self, index: int, image: np.ndarray):
        """image: (1, C, H, W) or (H, W, C) float [0, 1]."""
        import imageio.v2 as imageio

        if index % self.interval != 0:
            return
        img = np.asarray(image)
        if img.ndim == 4:
            img = img[0].transpose(1, 2, 0)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(self.dir, f"{index:06d}.png"), img)
