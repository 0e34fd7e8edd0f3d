"""Run a TPU job under a stall watchdog, restarting on tunnel hangs.

The axon TPU tunnel's remote compile RPC occasionally never returns (the
client process sits in a futex wait with zero CPU accumulation; observed
repeatedly this round — fresh identical processes succeed). Mitigation:

- enable the persistent JAX compilation cache (works with the axon
  backend; verified: cache entries land in .jax_cache and hit on rerun),
  so a restarted attempt fast-forwards through every compile that
  already succeeded;
- watch the child's stdout/stderr log: if it grows nothing for
  --stall-secs, kill the process group and start a fresh attempt.

Usage:
    python proto/tpu_watchdog.py --log /tmp/x.log --stall-secs 300 \
        --attempts 6 -- python proto/proto_ext_label_probe.py ...

Exit code = the child's on first success, or 97 if every attempt stalled.
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True)
    p.add_argument("--stall-secs", type=int, default=300)
    p.add_argument("--attempts", type=int, default=6)
    p.add_argument("--total-timeout", type=int, default=14400)
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given"

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

    t_start = time.time()
    for attempt in range(1, args.attempts + 1):
        with open(args.log, "ab", buffering=0) as logf:
            logf.write(f"\n===== watchdog attempt {attempt} =====\n".encode())
            proc = subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                    env=env, start_new_session=True)
            last_size = -1
            last_change = time.time()
            while True:
                rc = proc.poll()
                if rc is not None:
                    if rc == 0:
                        print(f"watchdog: success on attempt {attempt}")
                        return 0
                    print(f"watchdog: attempt {attempt} exited rc={rc}")
                    break
                size = os.path.getsize(args.log)
                now = time.time()
                if size != last_size:
                    last_size, last_change = size, now
                stalled = now - last_change > args.stall_secs
                out_of_time = now - t_start > args.total_timeout
                if stalled or out_of_time:
                    why = "stall" if stalled else "total-timeout"
                    print(f"watchdog: {why} on attempt {attempt}, killing")
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    proc.wait()
                    if out_of_time:
                        return 97
                    break
                time.sleep(10)
        time.sleep(15)  # let the tunnel settle before reconnecting
    return 97


if __name__ == "__main__":
    sys.exit(main())
