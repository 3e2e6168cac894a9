"""Quick shared-host window probe: steal delta + 4v16 bandwidth/ALU ceiling.

Run before launching an official `bench.py --scaling` run. Co-tenant
bandwidth storms on this shared VM last HOURS and are invisible to
/proc/stat steal — the only reliable signal is measuring what the box
can actually do right now. One rep each (~10 s total):

  * ``bw_ceiling_4_16``  — 4→16-process memory-stream scaling (clean
    host ≈ 0.82-0.90; a storm reads 0.1-0.6).
  * ``alu_ceiling_4_16`` — same for a pure-ALU burn (clean ≈ 1.0).
  * ``steal_delta``      — hypervisor steal jiffies across the probe.

Launch policy (see scripts/scaling_watcher.sh): require TWO consecutive
clean probes (bw ≥ 0.70, alu ≥ 0.85) 150 s apart before starting a run;
a single clean probe inside a decaying window produced run 43's noise.
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import _burn, _burn_bw  # noqa: E402


def _rate(fn, arg, procs, per=1):
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(fn, [arg] * (procs * per))
    return procs * per / (time.time() - t0)


def _steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[9])


def main() -> None:
    s0 = _steal()
    bw4 = max(_rate(_burn_bw, 6, 4) for _ in range(2))
    bw16 = max(_rate(_burn_bw, 6, 16) for _ in range(2))
    # max-of-2 like the bw probe: co-tenant noise only DEPRESSES a
    # rate, so the max is the cleaner reading — single-rep ALU probes
    # rejected near-clean windows on pure scheduling jitter
    alu4 = max(_rate(_burn, 12_000_000, 4, per=2) for _ in range(2))
    alu16 = max(_rate(_burn, 12_000_000, 16, per=2) for _ in range(2))
    print(json.dumps({
        "steal_delta": _steal() - s0,
        "bw_ceiling_4_16": round(bw16 / bw4 / 4.0, 3),
        "alu_ceiling_4_16": round(alu16 / alu4 / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
