"""Shared respawn watchdog for TPU measurement tools.

The remote-TPU tunnel wedges fresh processes at claim time or mid-compile
(bench.py header; ROUND2.md measurement-integrity notes).  Every
measurement tool should run its workload in a child process under
`run_watchdog(__file__)`: the child prints READY after its first device
op, heartbeat lines as it progresses, and the parent kills + respawns a
child that goes silent.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def _read_line(fd, buf, deadline):
    """(line | None(EOF) | 'timeout', buf) — select-based, never blocks
    past deadline (a wedged child emits nothing, ever)."""
    import select as _select

    while True:
        nl = buf.find(b"\n")
        if nl >= 0:
            return buf[: nl + 1].decode(), buf[nl + 1:]
        if time.time() >= deadline:
            return "timeout", buf
        r, _, _ = _select.select([fd], [], [], 1.0)
        if r:
            chunk = os.read(fd, 65536)
            if chunk == b"":
                return None, buf
            buf += chunk


def run_watchdog(script_path: str, attempts: int = 4,
                 ready_deadline_s: float = 150,
                 child_deadline_s: float = 2400,
                 quiet_deadline_s: float = 480) -> int:
    """Respawn loop: run `script_path --child <argv...>` until one child
    runs to EOF.  Child contract: print READY first, then heartbeat
    lines; silence past quiet_deadline_s = wedged."""
    for attempt in range(attempts):
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(script_path), "--child"]
            + [a for a in sys.argv[1:] if a != "--child"],
            stdout=subprocess.PIPE, stderr=sys.stderr)
        fd = p.stdout.fileno()
        buf = b""
        ln, buf = _read_line(fd, buf, time.time() + ready_deadline_s)
        if ln != "READY\n":
            p.kill(); p.wait()
            print(f"child wedged pre-READY (attempt {attempt})",
                  file=sys.stderr)
            continue
        total = time.time() + child_deadline_s
        done = False
        while True:
            ln, buf = _read_line(
                fd, buf, min(time.time() + quiet_deadline_s, total))
            if ln == "timeout" or ln is None:
                done = ln is None
                break
            print(ln, end="", flush=True)
        if done:
            # EOF: the child exited on its own — propagate its status
            # (a mid-run crash after READY must not read as success)
            rc = p.wait()
            if rc == 0:
                return 0
            print(f"child exited rc={rc} (attempt {attempt})",
                  file=sys.stderr)
            continue
        p.kill(); p.wait()
        print(f"child stalled (attempt {attempt})", file=sys.stderr)
    return 1


def child_ready():
    """Claim the device and signal the watchdog."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_bflio2")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    jnp.zeros(8).block_until_ready()
    print("READY", flush=True)
