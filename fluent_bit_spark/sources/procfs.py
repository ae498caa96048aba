"""in_proc / in_health: process and TCP-health snapshot records.

in_proc (reference /root/reference/plugins/in_proc/in_proc.c):
- pid lookup scans ``<proc>/*/cmdline`` and compares the BASENAME of
  the NUL-terminated first argument against ``proc_name``
  (get_pid_from_procname_linux :101-150, first match wins in glob
  order).
- memory comes from ``<proc>/<pid>/status`` ``Vm*`` lines; each value
  is every digit on the line folded into an int and multiplied by
  **1000** — not 1024 — for "kB" (update_mem_linux :346, a reference
  quirk kept verbatim). Tracked keys (mem_linux[] :40-99): Peak, Size,
  Lck, HWM, RSS, Data, Stk, Exe, Lib, PTE, Swap → record keys
  ``mem.Vm<name>``.
- fd count = entries under ``<proc>/<pid>/fd`` (update_fds_linux).
- the record is {alive, proc_name, pid, mem.*..., fd}
  (generate_record_linux :181-263); with ``alert`` on, a record is
  emitted only while the process is NOT alive (:189).

in_health (plugins/in_health/health.c:60-130): one record per check —
{alive: bool} (+ hostname/port under add_host/add_port); with
``alert`` on, only failed checks emit.

Both are driver-side samplers (one tiny record per tick), with
injectable roots/probes so tests and replays stay deterministic.
"""

from __future__ import annotations

import glob as _glob
import os

MEM_KEYS = ["Peak", "Size", "Lck", "HWM", "RSS", "Data", "Stk", "Exe",
            "Lib", "PTE", "Swap"]

PROC_SCHEMA = (
    "alive boolean, proc_name string, pid long, "
    + ", ".join(f"`mem.Vm{k}` long" for k in MEM_KEYS)
    + ", fd long"
)


def pid_from_procname(proc_path: str, proc_name: str) -> int:
    """First pid whose cmdline argv[0] basename equals proc_name."""
    for path in sorted(_glob.glob(os.path.join(proc_path, "*", "cmdline"))):
        try:
            with open(path, "rb") as fh:
                cmd = fh.read(1024)
        except OSError:
            continue
        if not cmd:
            continue
        bname = os.path.basename(cmd.split(b"\0", 1)[0].decode(
            "utf-8", "replace"))
        if bname == proc_name:
            try:
                return int(path.split(os.sep)[-2])
            except ValueError:
                continue
    return -1


def _mem_status(proc_path: str, pid: int) -> dict[str, int]:
    out = {f"mem.Vm{k}": 0 for k in MEM_KEYS}
    try:
        with open(os.path.join(proc_path, str(pid), "status")) as fh:
            lines = fh.readlines()
    except OSError:
        return out
    for line in lines:
        if not line.startswith("Vm"):
            continue
        name = line[2:].split(":", 1)[0]
        if name not in MEM_KEYS:
            continue
        # every digit on the line folded in; kB scaled by *1000*
        size = 0
        for ch in line:
            if ch.isdigit():
                size = size * 10 + ord(ch) - 48
        out[f"mem.Vm{name}"] = size * 1000
    return out


def proc_snapshot(
    proc_name: str,
    proc_path: str = "/proc",
    mem: bool = True,
    fd: bool = True,
    alert: bool = False,
) -> dict | None:
    """One in_proc record, or None when alert-gated (process alive)."""
    pid = pid_from_procname(proc_path, proc_name)
    alive = pid >= 0 and os.path.isdir(os.path.join(proc_path, str(pid)))
    if alive and alert:
        return None
    rec: dict = {"alive": alive, "proc_name": proc_name, "pid": pid}
    if mem:
        rec.update(_mem_status(proc_path, pid) if alive
                   else {f"mem.Vm{k}": 0 for k in MEM_KEYS})
    if fd:
        try:
            n = len(os.listdir(os.path.join(proc_path, str(pid), "fd")))
        except OSError:
            n = 0
        rec["fd"] = n if alive else 0
    return rec


def health_record(
    alive: bool,
    host: str | None = None,
    port: int | None = None,
    add_host: bool = False,
    add_port: bool = False,
    alert: bool = False,
) -> dict | None:
    """One in_health check record, or None when alert-gated."""
    if alive and alert:
        return None
    rec: dict = {"alive": bool(alive)}
    if add_host:
        rec["hostname"] = host
    if add_port:
        rec["port"] = port
    return rec
