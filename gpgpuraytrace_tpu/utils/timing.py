"""Measurement-discipline helpers shared by every timing harness.

The axon TPU tunnel's content-addressed replay cache spans PROCESSES: two
harnesses issuing bit-identical (executable, args) pairs replay each
other's executions (measured round 4: a median-of-3 bench child read
604 Mrays/s of pure cache). Every salted-differencing schedule therefore
mixes in a process-unique base — and the base must stay SMALL, because it
feeds ~1e-6-scaled scene perturbations and an O(1) perturbation changes
the march work itself (measured: a fake +44% "speedup"). See BASELINE.md
"Timing discipline" for both incidents.
"""

from __future__ import annotations

import os
import time


def process_salt_base() -> float:
    """Process-unique fraction on a ~1e-3 grid, in [0, 1).

    997 distinct streams; exactly representable in f32 next to the
    100–900 salt schedules the harnesses use (f32 resolution at 800 is
    ~6e-5). Derived from pid+time so two processes — or the same script
    run twice — never share a schedule.
    """
    return ((os.getpid() * 7919 + int(time.time() * 1e3)) % 997) / 997.0


def job_salt_base(job_key: str, bucket_s: int = 300) -> float:
    """Salt base shared by every process of ONE multi-process SPMD job but
    unique across jobs: derived from a job-wide key (e.g. the coordinator
    address) plus a coarse time bucket, NOT the pid (which differs per
    process — divergent salts under collectives would compute garbage).

    Caveat: processes launching astride a ``bucket_s`` boundary would
    disagree; launchers that can pass an explicit shared value (e.g.
    multiproc_bench via WORKER_SALT_BASE) should do so — this is the
    fallback for direct pod invocation.
    """
    h = 0
    for ch in job_key:
        h = (h * 131 + ord(ch)) % 1000003
    return ((h + int(time.time() / bucket_s)) % 997) / 997.0
