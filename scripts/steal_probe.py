"""Hypervisor-steal probe: measure what fraction of CPU cycles the host
steals from this VM while we hold a given load level.

Method (the direct measurement from BASELINE.md's round-3 "day-2 scaling"
row): fork N pure-CPU burn processes, read /proc/stat before and after a
fixed window, and report steal / total non-idle cycle deltas.  Steal under
~2% at 32-way load marks a window quiet enough for pairwise scaling ratios
to be meaningful; the round-3 storm measured 8-12.5% at the same load.

Usage: python scripts/steal_probe.py [n_procs] [seconds]
Prints one JSON line {"n_procs": N, "seconds": S, "steal_pct": x,
"busy_pct": y, "idle_pct": z}.
"""
import json
import multiprocessing
import sys
import time


def _burn(stop_t: float) -> None:
    x = 1.0
    while time.time() < stop_t:
        for _ in range(100_000):
            x = x * 1.0000001 + 1e-9
    # keep the optimizer honest
    if x < 0:
        print(x)


def _read_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal guest guest_nice
    vals = [int(v) for v in parts[1:9]]
    return vals


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    stop_t = time.time() + secs
    procs = [multiprocessing.Process(target=_burn, args=(stop_t,))
             for _ in range(n)]
    for p in procs:
        p.start()
    time.sleep(0.5)  # let the burn reach steady state
    a = _read_stat()
    time.sleep(max(0.5, secs - 1.5))
    b = _read_stat()
    for p in procs:
        p.join()
    d = [y - x for x, y in zip(a, b)]
    total = sum(d)
    idle = d[3] + d[4]
    steal = d[7]
    print(json.dumps({
        "n_procs": n, "seconds": secs,
        "steal_pct": round(100.0 * steal / max(1, total), 2),
        "busy_pct": round(100.0 * (total - idle - steal) / max(1, total), 2),
        "idle_pct": round(100.0 * idle / max(1, total), 2),
    }))


if __name__ == "__main__":
    main()
