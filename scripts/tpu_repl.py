#!/usr/bin/env python3
"""Persistent TPU worker: reads python source files from a spool directory and
execs them in-process (shared globals), appending output to a log.

Pays the axon-tunnel init + first-fetch warmup (~3.5 min) once per session.

Usage:
  python scripts/tpu_repl.py &          # start worker
  cp job.py /tmp/tpu_spool/job1.py      # submit (name order = run order)
  tail -f /tmp/tpu_repl.log

The worker moves each job to .done/.fail after running. `timeit(f, *args)`
is predefined in the exec namespace: fetch-synced per-iteration timing.
"""
import io
import os
import sys
import time
import traceback

SPOOL = "/tmp/tpu_spool"
LOG = "/tmp/tpu_repl.log"
os.makedirs(SPOOL, exist_ok=True)
os.makedirs(SPOOL + "/.done", exist_ok=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log_f = open(LOG, "a", buffering=1)


def log(msg):
    log_f.write(msg.rstrip("\n") + "\n")


log(f"=== worker starting pid={os.getpid()} ===")
t0 = time.perf_counter()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log(f"jax imported ({time.perf_counter()-t0:.1f}s); devices={jax.devices()}")
t0 = time.perf_counter()
_ = float(jnp.ones((8, 128)).sum())  # pay first-fetch warmup now
log(f"first fetch done ({time.perf_counter()-t0:.1f}s) — worker READY")


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return np.asarray(leaf).reshape(-1)[0]


def timeit(f, *args, iters=10, warmup=2, label=""):
    """Fetch-synced timing; returns ms/iter net of the measured round trip."""
    for _ in range(warmup):
        _sync(f(*args))
    # round-trip overhead: sync on an already-computed tiny array
    tiny = jnp.zeros((1,))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(tiny)
    rt = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
        _sync(r)
    ms = ((time.perf_counter() - t0) / iters - rt) * 1e3
    if label:
        log(f"{label}: {ms:9.3f} ms  (rt {rt*1e3:.1f} ms)")
    return ms


GLOBALS = {"jax": jax, "jnp": jnp, "np": np, "timeit": timeit, "log": log,
           "time": time, "_sync": _sync}

while True:
    jobs = sorted(f for f in os.listdir(SPOOL) if f.endswith(".py"))
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    path = os.path.join(SPOOL, job)
    with open(path) as fh:
        src = fh.read()
    log(f"--- running {job} ---")
    buf = io.StringIO()
    t0 = time.perf_counter()
    try:
        stdout0 = sys.stdout
        sys.stdout = buf
        try:
            exec(compile(src, job, "exec"), GLOBALS)
        finally:
            sys.stdout = stdout0
        status = "done"
    except Exception:
        buf.write(traceback.format_exc())
        status = "FAIL"
    for line in buf.getvalue().splitlines():
        log("  " + line)
    log(f"--- {job} {status} ({time.perf_counter()-t0:.1f}s) ---")
    os.replace(path, os.path.join(SPOOL, ".done", job))
