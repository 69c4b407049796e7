"""Run a (TPU) command under a wedge watchdog: respawn when its CPU
time stops growing (the remote-tunnel wedge signature — recvfrom-stuck
processes burn no CPU).  Usage:

    python tools/watchdog_run.py [--attempts N] [--stall-sec S] -- cmd ...
"""
import argparse
import subprocess
import sys
import time


def cpu_seconds(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / 100.0  # utime+stime
    except OSError:
        return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--stall-sec", type=float, default=240.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given"

    for attempt in range(args.attempts):
        p = subprocess.Popen(cmd)
        last_cpu, last_change = -1.0, time.time()
        while True:
            rc = p.poll()
            if rc is not None:
                if rc == 0:
                    return 0
                print(f"[watchdog] rc={rc} (attempt {attempt + 1})",
                      file=sys.stderr)
                break
            cpu = cpu_seconds(p.pid)
            if cpu > last_cpu + 0.5:
                last_cpu, last_change = cpu, time.time()
            elif time.time() - last_change > args.stall_sec:
                print(f"[watchdog] CPU stalled {args.stall_sec:.0f}s at "
                      f"{cpu:.0f}s (attempt {attempt + 1}), respawning",
                      file=sys.stderr)
                p.kill()
                p.wait()
                break
            time.sleep(5)
    print("[watchdog] all attempts failed", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
