"""Parallel Avro manifest decoding — the worker pool real Iceberg
plans manifests with, rendered as a small fork pool for the jar-free
reader.

After r8's manifest-LEVEL pruning, a pruned plan decodes only the
manifests whose partition-summary ranges match — but a WIDE query (or
``jobs/iceberg_maintenance.py``'s full walk) still paid O(total
manifest bytes) of single-threaded driver Python: PLANTIME measured
the full 100k-file plan at ~2.4 s (200 manifests, compiled decoder).
Real Iceberg fans manifest reads out to a worker pool
(``ManifestGroup.plan`` on an executor service); this module does the
same with ``multiprocessing`` fork workers, which inherit the already
-imported pure-stdlib ``avro_codec`` — no pyspark re-import, ~ms
startup.

Design constraints:

- **Deterministic order**: ``decode_avro_files`` returns record lists
  in input order (``Pool.map`` preserves it) — entry ordering and the
  sequence-number bookkeeping in ``iceberg_reader._snapshot_entries``
  are unchanged.
- **Fail-open**: pool creation or any task failure permanently falls
  back to in-process sequential decoding for the rest of the process
  (correctness never depends on the pool). Small batches never leave
  the process — below ``MIN_FILES``/``MIN_BYTES`` the fixed fork/IPC
  cost exceeds the decode itself.
- **Fork, not spawn**: children must not re-import the package (its
  ``__init__`` pulls pyspark); fork inherits the loaded modules. The
  children only read files, zlib-inflate and struct-unpack — they
  never touch py4j or the JVM. Non-POSIX platforms (no fork) simply
  stay sequential.
- ``SPARK_GRAFT_MANIFEST_PROCS`` overrides the worker count
  (``0`` disables the pool entirely).
"""

from __future__ import annotations

import atexit
import os

_POOL = None
_DISABLED = False
_N_PROCS: int | None = None

MIN_FILES = 4
MIN_BYTES = 1 << 20  # 1 MiB of manifest bytes before forking pays

# Forking a process that already runs py4j/JVM gateway threads can
# (rarely) clone a held lock into the child and hang it; the children
# do pure file+zlib+struct work in milliseconds, so a generous
# per-batch timeout converts a wedged pool into a sequential retry
# instead of hanging planning forever (ADVICE r9).
TASK_TIMEOUT_S = 60.0


def _procs() -> int:
    global _N_PROCS
    if _N_PROCS is None:
        env = os.environ.get("SPARK_GRAFT_MANIFEST_PROCS")
        if env is not None:
            _N_PROCS = max(0, int(env))
        else:
            _N_PROCS = min(8, max(2, (os.cpu_count() or 4) // 4))
    return _N_PROCS


def _close_pool() -> None:
    global _POOL
    if _POOL is not None:
        try:
            _POOL.terminate()
            _POOL.join()
        except Exception:
            pass
        _POOL = None


def _decode_one(path: str) -> list[dict]:
    from dst_spark_k8_lakehouse_spark.plans import avro_codec

    return list(avro_codec.read_avro_file(path))


def _ensure_pool():
    global _POOL, _DISABLED
    if _POOL is not None or _DISABLED:
        return _POOL
    try:
        import multiprocessing as mp

        n = _procs()
        if n < 2:
            _DISABLED = True
            return None
        _POOL = mp.get_context("fork").Pool(processes=n)
        atexit.register(_close_pool)
    except Exception:
        _DISABLED = True
        _POOL = None
    return _POOL


def run_tasks(fn, argtuples: list[tuple], paths: list[str]) -> list:
    """``[fn(*args) for args in argtuples]``, on the fork pool when
    the work is big enough to pay for it (``paths`` sizes the input),
    in-process otherwise — same results either way, in input order.
    ``fn`` must be a module-level function; a worker exception
    disables the pool and re-raises from the sequential retry (same
    error, pool never trusted again this process)."""
    global _DISABLED
    if len(argtuples) >= MIN_FILES and not _DISABLED:
        try:
            total = sum(os.path.getsize(p) for p in paths)
        except OSError:
            total = 0
        if total >= MIN_BYTES:
            pool = _ensure_pool()
            if pool is not None:
                try:
                    chunk = max(1, len(argtuples) // (_procs() * 4))
                    # async + timeout: a hung fork child (cloned lock)
                    # must degrade to the sequential path, not hang
                    # planning — a bare starmap can never time out
                    return pool.starmap_async(
                        fn, argtuples, chunksize=chunk
                    ).get(timeout=TASK_TIMEOUT_S)
                except Exception:
                    # fail-open: a broken pool must never break a plan
                    _DISABLED = True
                    _close_pool()
    return [fn(*args) for args in argtuples]


def decode_avro_files(paths: list[str]) -> list[list[dict]]:
    """Decode Avro container files to record-dict lists, parallel when
    it pays, sequentially otherwise — same results either way, in
    input order."""
    return run_tasks(_decode_one, [(p,) for p in paths], paths)
