#!/usr/bin/env python3
"""Deliberate co-resident CPU load for the drift-board A/B demo (r16
VERDICT task 1): N busy-spin workers for S seconds, then exit. Run
alongside graft.Bench to reproduce the contended-sandbox regime the
r14/r15 driver boards suffered; the interleaved parallelism-matched
null gates must discount the contention instead of flagging phantom
regressions. Usage: python3 tools/stress_load.py <seconds> [workers]
Dev tooling only — not part of the library.
"""
import multiprocessing, sys, time


def spin(deadline):
    x = 1.0
    while time.time() < deadline:
        for _ in range(100000):
            x = x * 1.0000001 + 1e-9
    return x


def main():
    secs = float(sys.argv[1])
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    deadline = time.time() + secs
    procs = [multiprocessing.Process(target=spin, args=(deadline,))
             for _ in range(workers)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()


if __name__ == "__main__":
    main()
