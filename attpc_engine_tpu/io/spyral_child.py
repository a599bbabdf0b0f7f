"""Standalone Spyral HDF5 writer child process.

Run as ``python .../spyral_child.py <tables.npz> <directory> <max_events>
<first_run> <compression|->``. DELIBERATELY imports no package modules and
no jax (the parent process talks to a tunneled TPU whose Python client is
GIL-sensitive — measured: a GIL-holding sibling thread throttles device
pulls to a crawl — so all host-side assembly + HDF5 work lives in this
separate OS process, fed via POSIX shared memory). When the parent
advertises the native library via ATTPC_SIO_LIB/ATTPC_SIO_HDF5 the whole
per-batch pipeline (Philox TB wiggle + per-event z-sort + f64 Spyral
assembly + per-event HDF5 dataset writes) runs in C (native/spyral_io.cpp,
bit-exact to the numpy+h5py fallback below); h5py is only imported on the
fallback/compression path.

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

import ctypes
import glob
import json
import os
import sys
from multiprocessing import resource_tracker, shared_memory

import numpy as np

EMPTY_SPYRAL = np.empty((0, 8), dtype=np.float64)
EMPTY_LABELS = np.empty((0,), dtype=np.int64)

_DPTR = ctypes.POINTER(ctypes.c_double)
_I64PTR = ctypes.POINTER(ctypes.c_int64)
_I32PTR = ctypes.POINTER(ctypes.c_int32)


def tune_malloc(threshold: int = 2**31 - 1) -> bool:
    """Raise glibc's mmap/trim thresholds so large buffers are served from
    the reused heap instead of fresh mmaps.

    On this dev VM every FIRST touch of a page pays a fluctuating 8-35 us
    hypervisor fault (BASELINE.md "page-fault tax"); glibc serves >32 MB
    allocations via mmap and munmaps them on free, so a per-batch ~10-40 MB
    numpy buffer re-faults every single batch. Keeping such blocks on the
    heap (M_MMAP_THRESHOLD up) and never trimming it (M_TRIM_THRESHOLD up)
    makes the pages warm after the first batch. Costs bounded RSS (the
    high-water mark of live allocations). Best-effort: returns False on
    non-glibc platforms.

    The default threshold is INT_MAX (mallopt takes int): the child's
    in-memory HDF5 image buffer is a single 1.5 GB block per run file
    (native sio_h5_open_mem) and must be heap-served to stay warm across
    files — any smaller threshold re-mmaps (and re-faults) it per file.
    """
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        m_trim_threshold = -1  # glibc malloc.h M_TRIM_THRESHOLD
        m_mmap_threshold = -3  # glibc malloc.h M_MMAP_THRESHOLD
        ok = libc.mallopt(m_mmap_threshold, threshold)
        ok &= libc.mallopt(m_trim_threshold, threshold)
        return bool(ok)
    except (OSError, AttributeError):
        return False


def load_native():
    """libspyral_io (native wiggle+sort+assemble + libhdf5 writer) or None.

    The parent (SpyralWriterProc) builds the library and passes its path
    plus h5py's bundled libhdf5 via ATTPC_SIO_LIB / ATTPC_SIO_HDF5; this
    child deliberately imports no package modules (a package import would
    drag in jax), so the ctypes setup is duplicated here — kept in sync
    with attpc_engine_tpu.native.configure_spyral_io by
    tests/test_native.py and tests/test_writer_proc.py.
    """
    if os.environ.get("ATTPC_TPU_NO_NATIVE"):
        return None
    so = os.environ.get("ATTPC_SIO_LIB")
    h5 = os.environ.get("ATTPC_SIO_HDF5")
    if not so or not h5 or not os.path.exists(so) or not os.path.exists(h5):
        return None
    try:
        lib = ctypes.CDLL(so)
        # h5py's repaired libhdf5 has no RPATH for its private deps
        for dep in sorted(glob.glob(os.path.join(os.path.dirname(h5), "*.so*"))):
            if "hdf5" not in os.path.basename(dep):
                ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
        lib.sio_wiggle.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64, _DPTR
        ]
        lib.sio_wiggle.restype = None
        lib.sio_assemble_batch.argtypes = [
            _I32PTR, ctypes.c_int64, _I64PTR, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, _DPTR, _DPTR, _DPTR, _DPTR, _DPTR,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, _DPTR, _I64PTR,
        ]
        lib.sio_assemble_batch.restype = None
        lib.sio_h5_init.argtypes = [ctypes.c_char_p]
        lib.sio_h5_init.restype = ctypes.c_int
        lib.sio_h5_open.argtypes = [ctypes.c_char_p]
        lib.sio_h5_open.restype = ctypes.c_void_p
        lib.sio_h5_write_event.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, _DPTR,
            ctypes.c_int64, _I64PTR,
        ]
        lib.sio_h5_write_event.restype = ctypes.c_int
        lib.sio_h5_write_events.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, _I64PTR,
            _I64PTR, ctypes.c_int64, _DPTR, _I64PTR,
        ]
        lib.sio_h5_write_events.restype = ctypes.c_int64
        lib.sio_h5_close.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64
        ]
        lib.sio_h5_close.restype = ctypes.c_int
        lib.sio_h5_mem_available.argtypes = []
        lib.sio_h5_mem_available.restype = ctypes.c_int
        lib.sio_h5_open_mem.argtypes = []
        lib.sio_h5_open_mem.restype = ctypes.c_void_p
        lib.sio_h5_close_mem.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p
        ]
        lib.sio_h5_close_mem.restype = ctypes.c_int
        lib.sio_h5_mem_prewarm.argtypes = []
        lib.sio_h5_mem_prewarm.restype = None
        if lib.sio_h5_init(h5.encode()) != 0:
            return None
        # opt-in 1.8-format files (dense attrs + fractal-heap links):
        # the per-event metadata CPU is the measured writer floor on
        # warm-page epochs; content is h5py-identical, bytes are not.
        # "0" disables like the repo's other flags (a truthiness check
        # would make the control arm of an A/B silently opt IN)
        if os.environ.get("ATTPC_H5_LATEST", "0") not in ("", "0"):
            try:
                lib.sio_h5_set_latest.argtypes = [ctypes.c_int]
                lib.sio_h5_set_latest.restype = None
                lib.sio_h5_set_latest(1)
            except AttributeError:
                pass  # older prebuilt .so without the toggle
        return lib
    except OSError:
        return None


def split_packed(packed):
    """[P, 2] i32 packed rows -> (q f32, tb i32, pad i32, lab i32).

    Standalone copy of detector.simulator.split_packed (this child
    deliberately imports no package modules); kept in sync by
    tests/test_writer_proc.py's byte-identical check.
    """
    q = np.ascontiguousarray(packed[:, 0]).view(np.float32)
    meta = packed[:, 1]
    return q, meta >> 22, (meta >> 8) & 0x3FFF, meta & 0xFF


def wiggle_for_events(counts, event_numbers, seed):
    """U[0, 1) f64 TB wiggle per event from Philox(seed, event_number)
    counter-based streams — independent of batching. Standalone copy of
    detector.simulator.wiggle_for_events."""
    out = np.empty(int(np.sum(counts)), np.float64)
    pos = 0
    for n, ev in zip(counts, event_numbers):
        n = int(n)
        if n:
            # key as an explicit uint64 array: a plain list would round
            # seeds >= 2**63 through float64 inside numpy's key conversion
            key = np.array(
                [int(seed) & 0xFFFFFFFFFFFFFFFF, int(ev)], dtype=np.uint64
            )
            gen = np.random.Generator(np.random.Philox(key=key))
            out[pos : pos + n] = gen.random(n)
            pos += n
    return out


def assemble(qf, tbf, pads, labs, tables):
    """Packed device rows -> Spyral [n, 8] f64 + labels i64.

    qf: [n] f32 gained charge; tbf: [n] f64 WIGGLED tb; pads/labs: ints.

    Every pass over the ~590k-row batch costs real milliseconds on this
    one-core host (and steals cycles from the parent's tunnel pump), so the
    arithmetic is written column-into-place with minimal temporaries.
    """
    pads = pads.astype(np.int64)
    labels = labs.astype(np.int64)
    out = np.empty((len(pads), 8), dtype=np.float64)
    q = out[:, 3]  # scratch: holds q until overwritten by amp
    np.copyto(q, qf)
    tbs = out[:, 6]
    np.copyto(tbs, tbf)
    # integral via the sorted-response prefix trick (same arithmetic as
    # DetectorSimulator.assemble_spyral)
    thr = np.divide(4095.0, np.maximum(q, 1e-300))
    idx = np.searchsorted(tables["resp_asc"], thr, side="right")
    num_tb = len(tables["resp_asc"])
    integral = out[:, 4]
    np.multiply(q, tables["resp_prefix"][idx], out=integral)
    integral += 4095.0 * (num_tb - idx)
    amp = out[:, 3]  # overwrites the q scratch
    np.multiply(q, tables["resp_max"], out=amp)
    np.minimum(amp, 4095.0, out=amp)
    win = float(tables["windows_edge"])
    mm = float(tables["micromegas_edge"])
    # same op order as DetectorSimulator.assemble_spyral — the result must
    # stay bit-identical, so no reassociation of these f64 steps
    z = out[:, 2]
    np.subtract(win, tbs, out=z)
    z /= win - mm
    z *= float(tables["length"])
    z *= 1000.0
    if "pad_cx" not in tables:  # contiguous column views, split once
        tables["pad_cx"] = np.ascontiguousarray(tables["pad_centers"][:, 0])
        tables["pad_cy"] = np.ascontiguousarray(tables["pad_centers"][:, 1])
    np.take(tables["pad_cx"], pads, out=out[:, 0])
    np.take(tables["pad_cy"], pads, out=out[:, 1])
    out[:, 5] = pads
    np.take(tables["pad_sizes"], pads, out=out[:, 7])
    return out, labels


class ChildWriter:
    """Mirror of SpyralWriter's file rotation/attr behavior.

    The uncompressed path writes through h5py's LOW-LEVEL API with cached
    datatype/dataspace/property objects: the high-level ``create_dataset``
    + ``attrs[...] =`` machinery costs ~0.36 s per 384-event batch in pure
    Python/metadata overhead (768 datasets + 2,304 attrs — measured on
    this one-core host, where every child cycle stalls the parent's TPU
    tunnel pump). The low-level path produces the same file CONTENT
    (dataset values, dtypes, attrs — verified byte-for-value by
    tests/test_writer_proc.py against the in-process SpyralWriter).
    """

    def __init__(self, directory, max_events, first_run, compression,
                 native=None, run_stride=1, owns_first_file=True):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.max_events = max_events
        self.run_number = first_run
        self.run_stride = run_stride
        self.starting_event = 0
        self.last_event = 0
        self.events_written = 0
        self.kwargs = {}
        self._path = None
        # striped mode (run_stride > 1, see SpyralWriterProc n_shards):
        # this child owns every run_stride-th run file. Its first file is
        # opened lazily on the first routed event (so a shard that never
        # receives events leaves no stray empty file). min_event parity
        # with the single-child writer: the run's FIRST file keeps the
        # reference's min_event = 0 quirk (starting_event is never
        # reassigned before the first rotation, reference writer.py:175),
        # while every later file starts at its first written event — so
        # only the shard owning file 0 (owns_first_file) keeps 0.
        self._opened = run_stride == 1
        self._first_file_zero = owns_first_file
        if compression == "gzip":
            self.kwargs = {"compression": "gzip", "compression_opts": 1}
        elif compression and compression != "-":
            self.kwargs = {"compression": compression}
        # native (libspyral_io/libhdf5 C API) writer: uncompressed only —
        # the compression path keeps h5py's filter pipeline
        self._native = native if not self.kwargs else None
        self._fast = not self.kwargs
        # In-memory (core VFD) file building + single-pwrite
        # materialization with RECYCLED destination files. Opt-in by
        # creating <directory>/.recycle: long runs that prune verified run
        # files should MOVE them there instead of unlinking — a rename
        # keeps the file's already-faulted pages, and the no-O_TRUNC
        # pwrite in sio_h5_close_mem overwrites them at memory speed
        # instead of paying this VM's 8-35 us/page first-touch fault tax
        # (BASELINE.md "page-fault tax"; ~half the 1M-run wall time).
        self._recycle_dir = None
        self._mem = False
        if self._native is not None:
            import pathlib

            rdir = pathlib.Path(directory) / ".recycle"
            if rdir.is_dir() and self._native.sio_h5_mem_available():
                self._recycle_dir = rdir
                self._mem = True
                # fault the ~3 GB of image/arena blocks now, while the
                # parent is still compiling/streaming kinematics — the
                # per-file loop then runs with zero fresh page faults
                self._native.sio_h5_mem_prewarm()
        if self._native is None:
            import h5py

            self._h5py = h5py
            # cached HDF5 objects for the low-level path (file-format
            # types, little-endian, exactly what h5py's high-level path
            # would emit)
            self._t_f64 = h5py.h5t.IEEE_F64LE
            self._t_i64 = h5py.h5t.STD_I64LE
            self._s_scalar = h5py.h5s.create(h5py.h5s.SCALAR)
            self._a_i64 = np.empty((), dtype=np.int64)
            self._a_f64 = np.empty((), dtype=np.float64)
            self._ic_names = (
                b"ic_amplitude", b"ic_multiplicity", b"ic_integral",
                b"ic_centroid",
            )
        if self._opened:
            self._open()

    def _first_open(self, first_event: int) -> None:
        """Striped mode: open this shard's first file lazily (single-child
        mode opens eagerly in __init__). min_event matches what the
        single-child writer would record for the same file: 0 for the
        run's first file (the reference quirk), the first written event
        otherwise."""
        self._open()
        if not self._first_file_zero:
            self.starting_event = first_event
        self._opened = True

    def _open(self):
        import time

        t0 = time.perf_counter()
        self._open_inner()
        if os.environ.get("ATTPC_CHILD_TIMING") == "batch":
            print(
                f"[spyral-child] open run_{self.run_number:04d} "
                f"{time.perf_counter() - t0:.3f}s mem={self._mem}",
                file=sys.stderr,
            )

    def _open_inner(self):
        path = f"{self.directory}/run_{self.run_number:04d}.h5"
        self._path = path
        if self._mem:
            self._fid = self._native.sio_h5_open_mem()
            if self._fid:
                return
            self._mem = False  # core VFD unavailable: plain file path
        if self._native is not None:
            self._fid = self._native.sio_h5_open(path.encode())
            if not self._fid:
                raise RuntimeError(f"native HDF5 writer failed to open {path}")
            return
        self.file = self._h5py.File(path, "w")
        self.group = self.file.create_group("cloud")
        self._gid = self.group.id

    def _tmp_path(self) -> str:
        """Dot-prefixed sidecar the in-memory image is materialized into.

        The final run path must NEVER hold a complete old file with valid
        (wrong-range) attrs — the multi-host resume scan trusts the
        max_event attr as the durability marker — so the pwrite targets
        this temp (invisible to every run_*.h5 / *.h5 glob: pruner,
        resume scan, spare pool) and the finished image is os.replace'd
        onto the run path atomically."""
        d, name = os.path.split(self._path)
        return os.path.join(d, f".{name}.part")

    def _recycle_destination(self, tmp: str):
        """Rename a pruned predecessor onto the temp path so its warm
        pages are overwritten in place (rename preserves pages). Prefers
        the largest spare: pages past a short spare's end are fresh
        allocations that still pay the first-touch tax. Stale .part
        leftovers from a crashed predecessor are spares too — same warm
        pages, and consuming them keeps the directory clean."""
        stale = [
            p for p in glob.glob(
                os.path.join(os.path.dirname(self._path), ".run_*.h5.part")
            )
            if p != tmp
        ]
        spares = [str(p) for p in self._recycle_dir.glob("*.h5")] + stale
        if not spares:
            return
        try:
            spare = max(spares, key=os.path.getsize)
            os.replace(spare, tmp)
        except OSError:
            pass

    def _finalize(self):
        import time

        if not self._opened:  # striped shard that never received an event
            return
        t0 = time.perf_counter()
        self._finalize_inner()
        if os.environ.get("ATTPC_CHILD_TIMING") == "batch":
            print(
                f"[spyral-child] finalize run_{self.run_number:04d} "
                f"{time.perf_counter() - t0:.3f}s mem={self._mem}",
                file=sys.stderr,
            )

    def _finalize_inner(self):
        if self._mem:
            tmp = self._tmp_path()
            self._recycle_destination(tmp)
            rc = self._native.sio_h5_close_mem(
                self._fid, self.starting_event, self.last_event,
                tmp.encode(),
            )
            if rc != 0:
                raise RuntimeError(
                    f"native in-memory HDF5 close failed (rc={rc})"
                )
            # atomic publish: the run path transitions empty -> complete
            # new file in one rename (the durability invariant the resume
            # scan relies on; a crash before this line leaves only the
            # invisible .part)
            os.replace(tmp, self._path)
            return
        if self._native is not None:
            rc = self._native.sio_h5_close(
                self._fid, self.starting_event, self.last_event
            )
            if rc != 0:
                raise RuntimeError(f"native HDF5 close failed (rc={rc})")
            return
        self.group.attrs["min_event"] = self.starting_event
        self.group.attrs["max_event"] = self.last_event
        self.file.close()

    def _attr_i64(self, oid, name: bytes, value: int):
        aid = self._h5py.h5a.create(oid, name, self._t_i64, self._s_scalar)
        self._a_i64[()] = value
        aid.write(self._a_i64)
        aid.close()

    def _attr_f64(self, oid, name: bytes, value: float):
        aid = self._h5py.h5a.create(oid, name, self._t_f64, self._s_scalar)
        self._a_f64[()] = value
        aid.write(self._a_f64)
        aid.close()

    def _write_event_fast(self, spyral, labels, event_number):
        """Low-level twin of write_event (uncompressed, contiguous)."""
        h5s, h5d = self._h5py.h5s, self._h5py.h5d
        gid = self._gid
        space = h5s.create_simple(spyral.shape)
        did = h5d.create(
            gid, b"cloud_%d" % event_number, self._t_f64, space
        )
        if spyral.size:
            did.write(h5s.ALL, h5s.ALL, spyral)
        self._attr_i64(did, b"orig_run", self.run_number)
        self._attr_i64(did, b"orig_event", event_number)
        for nm in self._ic_names:
            self._attr_f64(did, nm, -1.0)
        did.close()
        space = h5s.create_simple(labels.shape)
        did = h5d.create(
            gid, b"labels_%d" % event_number, self._t_i64, space
        )
        if labels.size:
            did.write(h5s.ALL, h5s.ALL, labels)
        did.close()

    def write_batch_native(self, spyral, labels, counts, raw_counts, start):
        """Bulk-write one batch through C (sio_h5_write_events), splitting
        at file-rotation boundaries — same semantics as the per-event
        write_event loop in main(): events whose raw batch was empty are
        skipped; all-below-ADC-threshold events get EMPTY datasets and
        count toward rotation."""
        lib = self._native
        n = len(counts)
        counts = np.ascontiguousarray(counts, dtype=np.int64)
        raws = (
            None
            if raw_counts is None
            else np.ascontiguousarray(raw_counts, dtype=np.int64)
        )
        written = counts > 0
        if raws is not None:
            written |= raws > 0
        row_off = np.concatenate([[0], np.cumsum(counts)])
        i = 0
        while i < n:
            w_rest = written[i:]
            if not w_rest.any():
                break
            k = i + int(np.argmax(w_rest))  # next event that gets written
            if not self._opened:
                self._first_open(start + k)
            if self.events_written == self.max_events:
                self._finalize()
                self.run_number += self.run_stride
                self._open()
                self.starting_event = start + k
                self.events_written = 0
            cap = self.max_events - self.events_written
            wcum = np.cumsum(written[k:])
            j = k + int(np.searchsorted(wcum, cap, side="right"))
            lo, hi = int(row_off[k]), int(row_off[j])
            rc = lib.sio_h5_write_events(
                self._fid, self.run_number, start + k,
                counts[k:j].ctypes.data_as(_I64PTR),
                None if raws is None else raws[k:j].ctypes.data_as(_I64PTR),
                j - k,
                spyral[lo:hi].ctypes.data_as(_DPTR) if hi > lo else None,
                labels[lo:hi].ctypes.data_as(_I64PTR) if hi > lo else None,
            )
            if rc < 0:
                raise RuntimeError(f"native HDF5 bulk write failed (rc={rc})")
            self.events_written += int(rc)
            self.last_event = start + k + int(np.where(written[k:j])[0][-1])
            i = j

    def write_event(self, spyral, labels, event_number):
        if not self._opened:
            self._first_open(event_number)
        if self.events_written == self.max_events:
            self._finalize()
            self.run_number += self.run_stride
            self._open()
            self.starting_event = event_number
            self.events_written = 0
        if self._native is not None:
            n = len(spyral)
            rc = self._native.sio_h5_write_event(
                self._fid, self.run_number, event_number,
                spyral.ctypes.data_as(_DPTR) if n else None, n,
                labels.ctypes.data_as(_I64PTR) if n else None,
            )
            if rc != 0:
                raise RuntimeError(
                    f"native HDF5 write failed (rc={rc}, event={event_number})"
                )
        elif self._fast:
            self._write_event_fast(spyral, labels, event_number)
        else:
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
    import os
    import time

    tables_path, directory, max_events, first_run, compression = sys.argv[1:6]
    run_stride = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    owns_first = (sys.argv[7] != "0") if len(sys.argv) > 7 else True
    if os.environ.get("ATTPC_CHILD_TIMING"):
        print(f"[spyral-child] main() at {time.time():.3f}", file=sys.stderr)
    tune_malloc()  # keep big numpy/HDF5 buffers heap-warm (page-fault tax)
    tables = dict(np.load(tables_path))
    writer = ChildWriter(directory, int(max_events), int(first_run),
                         compression, native=load_native(),
                         run_stride=run_stride, owns_first_file=owns_first)
    native = writer._native
    if native is not None:
        # contiguous f64 views the C assembler indexes directly
        nat = {
            "pad_cx": np.ascontiguousarray(tables["pad_centers"][:, 0]),
            "pad_cy": np.ascontiguousarray(tables["pad_centers"][:, 1]),
            "pad_sizes": np.ascontiguousarray(tables["pad_sizes"]),
            "resp_asc": np.ascontiguousarray(tables["resp_asc"]),
            "resp_prefix": np.ascontiguousarray(tables["resp_prefix"]),
        }
        nat_scalars = (
            len(nat["resp_asc"]), float(tables["resp_max"]),
            float(tables["windows_edge"]), float(tables["micromegas_edge"]),
            float(tables["length"]),
        )
    out = sys.stdout
    timing = os.environ.get("ATTPC_CHILD_TIMING")
    t_wait = t_copy = t_work = 0.0
    t_wig = t_asm = t_sw = 0.0
    n_batches = 0
    # the parent reuses a pool of segments (a fresh one per batch costs
    # ~50 ms in first-touch page faults); keep attachments open by name
    segs: dict = {}
    # persistent assembly output buffers (native path): refreshing ~40 MB
    # of np.empty per batch would re-fault the pages every time
    asm_buf: list = [None, None]

    def _close_segs():
        for s in segs.values():
            try:
                s.close()
            except Exception:
                pass
        segs.clear()

    t_mark = time.perf_counter()
    for line in sys.stdin:
        t0 = time.perf_counter()
        t_wait += t0 - t_mark
        msg = json.loads(line)
        if msg.get("close"):
            _close_segs()
            writer._finalize()
            if timing:
                import resource

                ru = resource.getrusage(resource.RUSAGE_SELF)
                print(
                    f"[spyral-child] batches={n_batches} wait={t_wait:.2f}s "
                    f"copy={t_copy:.2f}s work={t_work:.2f}s "
                    f"(wiggle={t_wig:.2f} assemble={t_asm:.2f} "
                    f"sort+write={t_sw:.2f}) "
                    f"cpu={ru.ru_utime + ru.ru_stime:.2f}s "
                    f"minflt={ru.ru_minflt}",
                    file=sys.stderr,
                )
            out.write("done\n")
            out.flush()
            return 0
        rows = msg["rows"]
        shm = segs.get(msg["shm"])
        if shm is None:
            shm = shared_memory.SharedMemory(name=msg["shm"])
            segs[msg["shm"]] = shm
            # Python 3.12's tracker registers ATTACHED segments too and
            # warns at exit when the parent (the owner) has unlinked them;
            # this child never owns a segment, so drop the registration
            try:
                resource_tracker.unregister(shm._name, "shared_memory")
            except Exception:
                pass
        counts = msg["counts"]
        raw_counts = msg.get("raw_counts")
        start = msg["start"]
        if native is not None:
            # zero-copy: the C assembler reads packed rows straight from
            # the shared segment into persistent (page-warm) output
            # buffers, then the segment is acked back to the parent's
            # reuse pool — one C call covers wiggle + z-sort + assembly
            # (bit-exact twin of the numpy path below, tests/test_native.py)
            packed_view = np.ndarray((rows, 2), dtype=np.int32, buffer=shm.buf)
            c64 = np.ascontiguousarray(counts, dtype=np.int64)
            if asm_buf[0] is None or len(asm_buf[0]) < rows:
                cap = max(rows, 1 << 16)
                asm_buf[0] = np.empty((cap, 8), dtype=np.float64)
                asm_buf[1] = np.empty(cap, dtype=np.int64)
            spyral, labels = asm_buf[0], asm_buf[1]
            native.sio_assemble_batch(
                packed_view.ctypes.data_as(_I32PTR), rows,
                c64.ctypes.data_as(_I64PTR), len(c64), start,
                int(msg.get("wseed", 0)) & 0xFFFFFFFFFFFFFFFF,
                nat["pad_cx"].ctypes.data_as(_DPTR),
                nat["pad_cy"].ctypes.data_as(_DPTR),
                nat["pad_sizes"].ctypes.data_as(_DPTR),
                nat["resp_asc"].ctypes.data_as(_DPTR),
                nat["resp_prefix"].ctypes.data_as(_DPTR),
                *nat_scalars,
                spyral.ctypes.data_as(_DPTR),
                labels.ctypes.data_as(_I64PTR),
            )
            t1 = time.perf_counter()
            t_asm += t1 - t0
            out.write(f"ok {msg['shm']}\n")
            out.flush()
            writer.write_batch_native(spyral, labels, counts, raw_counts,
                                      start)
            t_mark = time.perf_counter()
            t_sw += t_mark - t1
            t_work += t_mark - t0
            n_batches += 1
            if timing == "batch":
                print(
                    f"[spyral-child] b{n_batches} rows={rows} "
                    f"asm={t1 - t0:.3f}s write={t_mark - t1:.3f}s",
                    file=sys.stderr,
                )
            continue
        # ---- pure-Python fallback path ---------------------------------
        # copy out and ack IMMEDIATELY: the parent blocks on this ack
        # for backpressure, and the copy is ~10 ms while assemble+write
        # take hundreds — acking early keeps the parent's tunnel loop
        # running
        packed = np.array(
            np.ndarray((rows, 2), dtype=np.int32, buffer=shm.buf)
        )
        t1 = time.perf_counter()
        t_copy += t1 - t0
        out.write(f"ok {msg['shm']}\n")
        out.flush()
        ta = time.perf_counter()
        offsets = np.concatenate([[0], np.cumsum(counts)])
        q, tbi, pad, lab = split_packed(packed)
        # host-side TB wiggle (f64, per-event counter streams) + exact
        # z ordering: the device pre-sorts by descending integer tb, the
        # wiggle breaks the remaining same-tb ties exactly as the
        # reference's z argsort over wiggled tbs (writer.py:236-238)
        wig = wiggle_for_events(
            counts, np.arange(start, start + len(counts)),
            msg.get("wseed", 0),
        )
        tbf = tbi + wig
        # per-event exact z order (descending wiggled tb) applied to the
        # four NARROW input columns before assembly — ~20 bytes/row moved
        # instead of gathering the assembled 72-byte f64 rows
        for i, n in enumerate(counts):
            if n > 1:
                lo, hi = int(offsets[i]), int(offsets[i + 1])
                order = np.argsort(-tbf[lo:hi], kind="stable")
                q[lo:hi] = q[lo:hi][order]
                tbf[lo:hi] = tbf[lo:hi][order]
                pad[lo:hi] = pad[lo:hi][order]
                lab[lo:hi] = lab[lo:hi][order]
        tb_ = time.perf_counter(); t_wig += tb_ - ta
        spyral, labels = assemble(q, tbf, pad, lab, tables)
        tc_ = time.perf_counter(); t_asm += tc_ - tb_
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
        t_mark = time.perf_counter()
        t_sw += t_mark - tc_
        t_work += t_mark - t1
        n_batches += 1
    # stdin closed without a close message (parent died): finalize anyway
    _close_segs()
    writer._finalize()
    return 0


if __name__ == "__main__":
    sys.exit(main())
