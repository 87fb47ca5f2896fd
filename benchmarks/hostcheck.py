"""Host-idleness stamping for measurement validity (VERDICT r4 #7).

The bench host has ONE CPU. Round 4's first folder A/B was invalidated by
a concurrent pytest run (walls tripled — ROUND4.md); "only host-idle A/Bs
are valid" was convention until now. This module turns it into mechanism:
every measurement harness stamps `os.getloadavg()` at window start/end
into its artifact and flags `contaminated: true` when another heavy
process is plausibly running. Harnesses that would rather not produce a
contaminated artifact at all pass ``refuse=True``.

Threshold semantics on a 1-CPU host: a process that just started inherits
the PREVIOUS minute's machine load, so a start-of-run 1-minute load above
``limit`` (default 0.75) means something else was recently burning the
CPU. End-of-run stamps are informational only — the measuring process
itself drives load to ~1 during compiles, so they cannot gate.
"""

from __future__ import annotations

import os

DEFAULT_LIMIT = float(os.environ.get("DMT_LOAD_LIMIT", "0.75"))


def load_stamp() -> dict:
    """1/5/15-minute load averages plus the CPU count they are read
    against (this host: 1)."""
    la1, la5, la15 = os.getloadavg()
    return {"load_1m": round(la1, 3), "load_5m": round(la5, 3),
            "load_15m": round(la15, 3), "ncpu": os.cpu_count()}


def host_idle_check(limit: float = DEFAULT_LIMIT, refuse: bool = False) -> dict:
    """Stamp the current load and judge contamination against ``limit``.

    Returns ``{"start": stamp, "limit": limit, "contaminated": bool}``.
    With ``refuse=True`` a contaminated host raises RuntimeError instead —
    for A/B harnesses whose artifact is worthless under contention.
    """
    stamp = load_stamp()
    contaminated = stamp["load_1m"] > limit
    result = {"start": stamp, "limit": limit, "contaminated": contaminated}
    if contaminated and refuse:
        raise RuntimeError(
            f"host not idle: 1-minute load {stamp['load_1m']} > {limit} "
            "on a 1-CPU host — another heavy process is running; this "
            "measurement would be invalid (ROUND4.md). Re-run when idle "
            "or raise DMT_LOAD_LIMIT to override.")
    return result


def finish(check: dict) -> dict:
    """Add the end-of-run stamp (informational) and return ``check``."""
    check["end"] = load_stamp()
    return check
