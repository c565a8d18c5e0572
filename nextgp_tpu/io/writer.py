"""Asynchronous MCMC output spooling.

The reference appends one tab-delimited row per tracked quantity per kept
iteration, synchronously, inside the chain loop (`IO.outMCMC`,
/root/reference/src/outFiles.jl:17-21; call sites src/samplers.jl:56-104).
Here the device returns a thinned-sample pytree per interval and a host
writer thread drains a queue, so device sweeps never block on the
filesystem. File naming matches the reference: `<quantity>Out` with a
header row, in a per-run output folder that is wiped on start
(folderHandler, src/misc.jl:221-232).
"""
from __future__ import annotations

import os
import queue
import shutil
import threading
from typing import Dict, List, Optional

import numpy as np


def folder_handler(out_folder: str):
    """Delete-and-recreate the output folder (misc.jl:221-232)."""
    if os.path.isdir(out_folder):
        shutil.rmtree(out_folder)
    os.makedirs(out_folder, exist_ok=True)


class MCMCWriter:
    """Queue-backed writer: `put(sample_dict)` from the chain loop;
    a daemon thread appends rows. `close()` drains and flushes."""

    def __init__(self, out_folder: str, headers: Optional[Dict[str, List[str]]] = None):
        self.out_folder = out_folder
        os.makedirs(out_folder, exist_ok=True)
        self._files: Dict[str, object] = {}
        self._headers = headers or {}
        self._q: "queue.Queue" = queue.Queue(maxsize=64)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._err: Optional[BaseException] = None
        self._thread.start()

    def _file(self, name: str, width: int):
        if name not in self._files:
            path = os.path.join(self.out_folder, f"{name}Out")
            fh = open(path, "a", buffering=1 << 20)
            if os.path.getsize(path) == 0:
                hdr = self._headers.get(name) or [f"{name}{i + 1}" for i in range(width)]
                fh.write("\t".join(str(h) for h in hdr) + "\n")
            self._files[name] = fh
        return self._files[name]

    def _write_row(self, name: str, row: np.ndarray):
        row = np.atleast_1d(np.asarray(row)).reshape(-1)
        fh = self._file(name, row.size)
        fh.write("\t".join(repr(float(v)) if row.dtype.kind == "f" else str(v) for v in row))
        fh.write("\n")

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, threading.Event):  # flush barrier
                for fh in self._files.values():
                    fh.flush()
                item.set()
                continue
            try:
                for name, val in item.items():
                    self._write_row(name, np.asarray(val))
            except BaseException as e:  # surfaced on close()
                self._err = e

    def put(self, sample: Dict[str, np.ndarray]):
        # device -> host transfer happens here, off the compute path
        self._q.put({k: np.asarray(v) for k, v in sample.items()})

    def flush(self):
        """Drain queued samples and flush files (checkpoint consistency)."""
        barrier = threading.Event()
        self._q.put(barrier)
        barrier.wait()

    def close(self):
        self._q.put(None)
        self._thread.join()
        for fh in self._files.values():
            fh.close()
        if self._err is not None:
            raise self._err
