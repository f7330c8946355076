"""Back every free guest page once, so nothing in the session pays
microVM first-touch faulting again.

Diagnosis (round 12, same boot as round 11): this VM class backs guest
frames lazily on the host — the FIRST touch of a never-touched frame
faults at ~0.03 GB/s single-thread (measured: 31.8 s to stream-write a
fresh 500 MB numpy array), while re-touching already-backed frames
runs at memory speed (1.56 GB/s). Round 11 attributed its 1.5-5x
slowdowns to "fresh-VM first-touch that warms up"; the round-12 finding
is sharper: it never fully self-heals, because with ~113 GB of pristine
frames the buddy allocator keeps handing untouched memory to every new
JVM heap/shuffle buffer, so even the Nth bench run stays ~1.3-1.4x
slow (builder-quiet 25.26 s vs the SAME boot's round-11 19.17 s).

Fix: allocate-and-touch chunks across threads until MemAvailable hits
a floor, hold them all live (so the kernel cannot recycle the already-
backed frames into the next request while pristine ones remain), then
free. Frames stay backed for the VM's lifetime; every later allocation
— this session's and the round driver's — reuses backed frames at full
speed. ~110 GB at the measured 0.28 GB/s parallel fault rate ≈ 7 min,
paid once per boot.

Run:  python tools/page_warm.py [floor_gib]   (default floor 10 GiB)
Prints before/after MemAvailable and a fresh-allocation probe time.
"""

from __future__ import annotations

import concurrent.futures as cf
import sys
import time

import numpy as np

CHUNK_MB = 512
STRIDE = 512  # touch one float64 per 4 KiB page


def mem_available_gib() -> float:
    with open("/proc/meminfo") as fh:
        for line in fh:
            if line.startswith("MemAvailable:"):
                return int(line.split()[1]) / (1024 * 1024)
    raise RuntimeError("MemAvailable not found")


def probe_fresh_alloc() -> float:
    t0 = time.perf_counter()
    a = np.empty(500 * 1024 * 1024 // 8)
    a[::STRIDE] = 1.0
    return time.perf_counter() - t0


def touch_chunk(_: int) -> np.ndarray:
    a = np.empty(CHUNK_MB * 1024 * 1024 // 8)
    a[::STRIDE] = 1.0
    return a


def main() -> None:
    floor_gib = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    before = mem_available_gib()
    t_probe0 = probe_fresh_alloc()
    print(f"before: MemAvailable {before:.1f} GiB, fresh-500MB probe {t_probe0:.2f}s",
          flush=True)
    held: list[np.ndarray] = []
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(32) as ex:
        while mem_available_gib() > floor_gib:
            n = min(32, max(1, int((mem_available_gib() - floor_gib) * 1024 // CHUNK_MB)))
            held.extend(ex.map(touch_chunk, range(n)))
            done = len(held) * CHUNK_MB / 1024
            dt = time.perf_counter() - t0
            print(f"  backed {done:.0f} GiB in {dt:.0f}s ({done/dt:.2f} GiB/s)",
                  flush=True)
    held.clear()
    time.sleep(2)
    after = mem_available_gib()
    t_probe1 = probe_fresh_alloc()
    print(f"after: MemAvailable {after:.1f} GiB, fresh-500MB probe {t_probe1:.2f}s "
          f"(was {t_probe0:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
