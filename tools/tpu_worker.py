#!/usr/bin/env python
"""Persistent TPU FIFO worker — batch experiments into ONE axon client.

The axon TPU tunnel costs 30-300 s of cold-start per process, and the
runtime crashes (~10 min recovery) if a SECOND client attaches.  This
worker holds the tunnel open and executes python snippets on demand:

    python tools/tpu_worker.py /tmp/tpuwork &   # start once (background)
    # submit work: write a python source string to the cmd FIFO
    cat snippet.py > /tmp/tpuwork/cmd
    # results: the worker appends stdout/traceback to /tmp/tpuwork/log
    tail -f /tmp/tpuwork/log

Snippets run via exec() in a SHARED namespace that persists across
snippets (so `model`, `variables`, jitted fns survive between
submissions — re-use them instead of re-initialising).  The namespace is
pre-seeded with `jax`, `jnp`, `np`, `time`.

A pid lockfile (`worker.lock`) refuses a double-start: ALWAYS check
`ps aux | grep worker` for a live worker from a previous session before
starting one.  Write `__QUIT__` to the FIFO to shut down cleanly.

Each snippet's output is bracketed by `=== BEGIN <sha8>` / `=== END
<sha8> ok|err <dt>s` lines so a submitter can poll the log for its own
completion marker.
"""

from __future__ import annotations

import hashlib
import io
import os
import sys
import time
import traceback


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuwork"
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, "worker.lock")
    if os.path.exists(lock):
        pid = open(lock).read().strip()
        if pid and os.path.exists(f"/proc/{pid}"):
            print(f"refusing to start: live worker pid {pid} holds {lock}",
                  file=sys.stderr)
            sys.exit(1)
        os.unlink(lock)
    with open(lock, "w") as f:
        f.write(str(os.getpid()))

    cmd = os.path.join(root, "cmd")
    if not os.path.exists(cmd):
        os.mkfifo(cmd)
    log_path = os.path.join(root, "log")

    def log(msg: str) -> None:
        with open(log_path, "a") as f:
            f.write(msg if msg.endswith("\n") else msg + "\n")
            f.flush()

    # hold the tunnel open from the start so the first snippet is warm
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    n = jax.device_count()
    log(f"=== worker up pid={os.getpid()} devices={n} "
        f"platform={jax.devices()[0].platform} init={time.time() - t0:.1f}s")

    ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
    while True:
        with open(cmd) as f:  # blocks until a writer opens the FIFO
            src = f.read()
        if not src.strip():
            continue
        if src.strip() == "__QUIT__":
            log("=== worker quit")
            break
        tag = hashlib.sha1(src.encode()).hexdigest()[:8]
        log(f"=== BEGIN {tag}")
        buf = io.StringIO()
        t0, ok = time.time(), True
        stdout = sys.stdout
        try:
            sys.stdout = buf
            exec(compile(src, f"<snippet {tag}>", "exec"), ns)
        except Exception:
            ok = False
            buf.write(traceback.format_exc())
        finally:
            sys.stdout = stdout
        log(buf.getvalue())
        log(f"=== END {tag} {'ok' if ok else 'err'} {time.time() - t0:.1f}s")

    os.unlink(lock)


if __name__ == "__main__":
    main()
