"""Advisory host-wide TPU lock.

The hosted TPU sits behind a single-client tunnel, and this box has one
CPU core: two TPU clients (or a TPU client and a heavy CPU job) racing
each other corrupt BOTH measurements. Round 4's driver artifacts were
degraded exactly this way (MULTICHIP_r04 rc=124 and a -28% GF bench
figure, both captured while a builder queue saturated the host).

Everything that touches the TPU — `tools/queue.sh` workloads, bench.py,
`__graft_entry__` — serializes on one flock'd file. The lock is
advisory and self-cleaning (flock dies with the process; a stale file
holds no lock), so a crashed workload never wedges the queue.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import time

LOCK_PATH = os.environ.get("BTR_TPU_LOCK", "/tmp/btr_tpu.lock")

_HELD_FD = None


def hold_for_process(label: str = "", timeout_s: float = 1800.0) -> bool:
    """Acquire the TPU lock for the remaining lifetime of this process.

    Used by entry points whose device work happens after they return
    (bench.py's arms, __graft_entry__'s compile check): the flock is
    released automatically when the process exits. Re-entrant across
    fork/exec: once held, BTR_TPU_LOCK_HELD marks child processes (the
    dryrun's re-exec) as already covered. Returns whether the lock is
    actually held (False after a timeout — callers proceed regardless).
    """
    global _HELD_FD
    if _HELD_FD is not None or os.environ.get("BTR_TPU_LOCK_HELD") == "1":
        return True
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.monotonic()
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            waited = time.monotonic() - t0
            if waited >= timeout_s:
                print(f"tpu_lock[{label}]: still held after {waited:.0f}s;"
                      " proceeding WITHOUT the lock",
                      file=sys.stderr, flush=True)
                os.close(fd)
                return False
            if int(waited) % 60 < 5:
                print(f"tpu_lock[{label}]: waiting for {LOCK_PATH}"
                      f" ({waited:.0f}s)", file=sys.stderr, flush=True)
            time.sleep(5.0)
    try:
        os.ftruncate(fd, 0)
        os.write(fd, f"{label or 'anon'} pid={os.getpid()}\n".encode())
    except OSError:
        pass
    _HELD_FD = fd  # keep the fd (and flock) alive until process exit
    os.environ["BTR_TPU_LOCK_HELD"] = "1"
    return True


@contextlib.contextmanager
def tpu_lock(timeout_s: float = 1800.0, label: str = ""):
    """Block until the host TPU lock is held, then yield.

    On timeout the caller proceeds WITHOUT the lock (with a stderr
    note): a wedged queue must never turn a driver bench/dryrun capture
    red — the lock exists to prevent accidental overlap, not to
    deadlock the artifacts of record.
    """
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.monotonic()
    acquired = False
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                acquired = True
                break
            except OSError:
                waited = time.monotonic() - t0
                if waited >= timeout_s:
                    print(
                        f"tpu_lock[{label}]: still held after "
                        f"{waited:.0f}s; proceeding WITHOUT the lock",
                        file=sys.stderr, flush=True)
                    break
                if int(waited) % 60 < 5:
                    print(
                        f"tpu_lock[{label}]: waiting for {LOCK_PATH} "
                        f"({waited:.0f}s)", file=sys.stderr, flush=True)
                time.sleep(5.0)
        try:
            os.ftruncate(fd, 0)
            os.write(fd, f"{label or 'anon'} pid={os.getpid()}\n".encode())
        except OSError:
            pass
        yield acquired
    finally:
        if acquired:
            try:
                fcntl.flock(fd, fcntl.LOCK_UN)
            except OSError:
                pass
        os.close(fd)
