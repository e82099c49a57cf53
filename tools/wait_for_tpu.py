"""Wait for the TPU relay to become healthy, then run a command.

The axon relay occasionally wedges (a killed TPU-attached process can
poison the claim; observed outages range from minutes to hours, during
which backend init blocks ~25 minutes before failing with "TPU backend
setup/compile error (Unavailable)"). This tool probes with a SUBPROCESS
per attempt — never a timeout-kill of a shared process, which is what
poisons claims in the first place — and execs the given command once a
trivial device program round-trips.

Usage:
  python tools/wait_for_tpu.py [--attempts 60] [--sleep 60] -- \
      python bench.py --preset nllb-offload
"""

import argparse
import subprocess
import sys
import time

PROBE = """
import jax, jax.numpy as jnp, numpy as np
print(np.asarray(jnp.arange(4) + 1))
"""


def healthy(timeout_s: float) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE], capture_output=True,
            timeout=timeout_s, text=True,
        )
        return r.returncode == 0 and "[1 2 3 4]" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--attempts", type=int, default=60)
    p.add_argument("--sleep", type=float, default=60.0)
    p.add_argument("--probe-timeout", type=float, default=2400.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run once healthy (prefix with --)")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd

    for attempt in range(args.attempts):
        if healthy(args.probe_timeout):
            print(f"[wait_for_tpu] healthy at attempt {attempt}", flush=True)
            break
        print(f"[wait_for_tpu] unhealthy attempt {attempt} "
              f"{time.strftime('%H:%M:%S')}", flush=True)
        time.sleep(args.sleep)
    else:
        print("[wait_for_tpu] never became healthy", flush=True)
        return 1
    if not cmd:
        return 0
    return subprocess.run(cmd).returncode


if __name__ == "__main__":
    sys.exit(main())
