"""Standalone Spyral HDF5 writer child process.

Run as ``python .../spyral_child.py <tables.npz> <directory> <max_events>
<first_run> <compression|->``. DELIBERATELY imports only numpy/h5py (no
jax, no package imports): the parent process talks to a tunneled TPU whose
Python client is GIL-sensitive — measured: a GIL-holding sibling thread
throttles device pulls to a crawl — so all host-side assembly + HDF5 work
lives in this separate OS process, fed via POSIX shared memory.

Protocol (stdin, one JSON object per line):
  {"shm": name, "rows": N, "counts": [...], "start": first_event_number}
      -> assemble + write one batch; reply "ok <shm>\\n" on stdout once the
         shared memory can be released.
  {"close": true}
      -> finalize the open file (min/max_event attrs), reply "done\\n".

The Spyral assembly here is the same arithmetic as
DetectorSimulator.assemble_spyral (f64, the reference's writer math —
/root/reference/src/attpc_engine/detector/writer.py:61-112) — kept in sync
by tests/test_writer_proc.py, which checks byte-identical output against
the in-process writer.
"""

import json
import sys
from multiprocessing import resource_tracker, shared_memory

import h5py
import numpy as np

EMPTY_SPYRAL = np.empty((0, 8), dtype=np.float64)
EMPTY_LABELS = np.empty((0,), dtype=np.int64)


def assemble(pf, pi, tables):
    """Packed device rows -> Spyral [n, 8] f64 + labels i64."""
    pads = pi[:, 0].astype(np.int64)
    labels = pi[:, 1].astype(np.int64)
    q = pf[:, 0].astype(np.float64)
    tbs = pf[:, 1].astype(np.float64)
    amp = np.minimum(tables["resp_max"] * q, 4095.0)
    thr = 4095.0 / np.maximum(q, 1e-300)
    idx = np.searchsorted(tables["resp_asc"], thr, side="right")
    num_tb = len(tables["resp_asc"])
    integral = q * tables["resp_prefix"][idx] + 4095.0 * (num_tb - idx)
    win = float(tables["windows_edge"])
    mm = float(tables["micromegas_edge"])
    out = np.empty((len(pads), 8), dtype=np.float64)
    out[:, 0] = tables["pad_centers"][pads, 0]
    out[:, 1] = tables["pad_centers"][pads, 1]
    out[:, 2] = (win - tbs) / (win - mm) * float(tables["length"]) * 1000.0
    out[:, 3] = amp
    out[:, 4] = integral
    out[:, 5] = pads
    out[:, 6] = tbs
    out[:, 7] = tables["pad_sizes"][pads]
    return out, labels


class ChildWriter:
    """Mirror of SpyralWriter's file rotation/attr behavior."""

    def __init__(self, directory, max_events, first_run, compression):
        self.directory = directory
        self.max_events = max_events
        self.run_number = first_run
        self.starting_event = 0
        self.last_event = 0
        self.events_written = 0
        self.kwargs = {}
        if compression == "gzip":
            self.kwargs = {"compression": "gzip", "compression_opts": 1}
        elif compression and compression != "-":
            self.kwargs = {"compression": compression}
        self._open()

    def _open(self):
        self.file = h5py.File(
            f"{self.directory}/run_{self.run_number:04d}.h5", "w"
        )
        self.group = self.file.create_group("cloud")

    def _finalize(self):
        self.group.attrs["min_event"] = self.starting_event
        self.group.attrs["max_event"] = self.last_event
        self.file.close()

    def write_event(self, spyral, labels, event_number):
        if self.events_written == self.max_events:
            self._finalize()
            self.run_number += 1
            self._open()
            self.starting_event = event_number
            self.events_written = 0
        d = self.group.create_dataset(
            f"cloud_{event_number}", data=spyral, **self.kwargs
        )
        d.attrs["orig_run"] = self.run_number
        d.attrs["orig_event"] = event_number
        d.attrs["ic_amplitude"] = -1.0
        d.attrs["ic_multiplicity"] = -1.0
        d.attrs["ic_integral"] = -1.0
        d.attrs["ic_centroid"] = -1.0
        self.group.create_dataset(
            f"labels_{event_number}", data=labels, **self.kwargs
        )
        self.last_event = event_number
        self.events_written += 1


def main() -> int:
    tables_path, directory, max_events, first_run, compression = sys.argv[1:6]
    tables = dict(np.load(tables_path))
    writer = ChildWriter(directory, int(max_events), int(first_run), compression)
    out = sys.stdout
    for line in sys.stdin:
        msg = json.loads(line)
        if msg.get("close"):
            writer._finalize()
            out.write("done\n")
            out.flush()
            return 0
        rows = msg["rows"]
        shm = shared_memory.SharedMemory(name=msg["shm"])
        try:
            # copy out and ack IMMEDIATELY: the parent blocks on this ack
            # for backpressure, and the copy is ~10 ms while assemble+write
            # take hundreds — acking early keeps the parent's tunnel loop
            # running
            pf = np.array(
                np.ndarray((rows, 2), dtype=np.float32, buffer=shm.buf)
            )
            pi = np.array(
                np.ndarray(
                    (rows, 2), dtype=np.int16, buffer=shm.buf, offset=rows * 8
                )
            )
        finally:
            shm.close()
            # Python 3.12's tracker registers ATTACHED segments too and
            # warns at exit when the parent (the owner) has unlinked them;
            # this child never owns a segment, so drop the registration
            try:
                resource_tracker.unregister(shm._name, "shared_memory")
            except Exception:
                pass
        out.write(f"ok {msg['shm']}\n")
        out.flush()
        spyral, labels = assemble(pf, pi, tables)
        counts = msg["counts"]
        raw_counts = msg.get("raw_counts")
        offsets = np.concatenate([[0], np.cumsum(counts)])
        start = msg["start"]
        for i, n in enumerate(counts):
            if n == 0:
                # reference parity: raw-empty events are skipped, but events
                # whose points all failed the ADC threshold get EMPTY
                # datasets and count toward file rotation
                # (reference simulator.py:204-205, writer.py:240-255)
                if raw_counts is None or raw_counts[i] == 0:
                    continue
                writer.write_event(EMPTY_SPYRAL, EMPTY_LABELS, start + i)
                continue
            lo, hi = int(offsets[i]), int(offsets[i + 1])
            writer.write_event(spyral[lo:hi], labels[lo:hi], start + i)
    # stdin closed without a close message (parent died): finalize anyway
    writer._finalize()
    return 0


if __name__ == "__main__":
    sys.exit(main())
