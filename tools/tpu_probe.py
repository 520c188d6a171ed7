"""Poll TPU tunnel health: one trivial device op per attempt, with a
watchdog (jax.devices() blocks indefinitely while the axon tunnel is
down, so each attempt runs in a subprocess under a hard timeout).

Usage: python tools/tpu_probe.py [--interval 300] [--attempts 0]
Logs one line per attempt; exits 0 on first success (or after
--attempts failures if nonzero).
"""

import argparse
import subprocess
import sys
import time

PROBE = (
    "import time, jax, jax.numpy as jnp;"
    "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache');"
    "t0=time.time(); d=jax.devices();"
    "assert d[0].platform != 'cpu', f'fell back to CPU: {d}';"
    "x=jnp.ones((256,256)); v=float((x@x).sum());"
    "print(f'TPU OK: {d[0].platform} {v:.0f} {time.time()-t0:.1f}s')"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=int, default=300)
    ap.add_argument("--attempts", type=int, default=0,
                    help="0 = poll until success")
    ap.add_argument("--timeout", type=int, default=180)
    args = ap.parse_args()

    n = 0
    while True:
        n += 1
        t = time.strftime("%H:%M:%S")
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE], capture_output=True,
                text=True, timeout=args.timeout)
            if out.returncode == 0 and "TPU OK" in out.stdout:
                print(f"[{t}] attempt {n}: {out.stdout.strip()}", flush=True)
                return 0
            err = out.stderr.strip().splitlines()
            print(f"[{t}] attempt {n}: rc={out.returncode} "
                  f"{err[-1] if err else '(no stderr)'}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{t}] attempt {n}: timeout ({args.timeout}s) — "
                  "tunnel still down", flush=True)
        if args.attempts and n >= args.attempts:
            return 1
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
