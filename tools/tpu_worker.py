"""Long-lived TPU job worker: claims the chip once, then executes job
files dropped into the queue dir. Avoids re-claim hangs from short-lived
killed processes on the flaky axon relay.

Job protocol: write <name>.py into QUEUE; worker execs it (fresh globals,
shared jax process), writes stdout+traceback to <name>.out, then renames
job to <name>.done. Poll for the .out file.
"""
import io
import os
import sys
import time
import traceback

QUEUE = "/root/repo/.tpu_jobs"
os.makedirs(QUEUE, exist_ok=True)
sys.path.insert(0, "/root/repo")

with open("/tmp/tpu_worker.pid", "w") as f:
    f.write(str(os.getpid()))

import jax  # claim once

print("worker up, devices:", jax.devices(), flush=True)

STATE = {}  # persists across jobs (stash big device trees here)

while True:
    jobs = sorted(f for f in os.listdir(QUEUE) if f.endswith(".py"))
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    path = os.path.join(QUEUE, job)
    out_path = path[:-3] + ".out"
    buf = io.StringIO()
    real = sys.stdout
    try:
        src = open(path).read()
        sys.stdout = buf
        exec(compile(src, path, "exec"), {"__name__": "__tpu_job__", "STATE": STATE})
        sys.stdout = real
    except BaseException:
        sys.stdout = real
        buf.write("\nTRACEBACK:\n" + traceback.format_exc())
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    os.rename(path, path[:-3] + ".done")
    import gc

    sys.last_traceback = None
    gc.collect()
    jax.clear_caches()
    gc.collect()
    print("finished", job, flush=True)
