"""Persistent TPU worker: connects to the device once, then executes job
files dropped into scripts/jobs/, writing captured output next to them.
Avoids paying the (flaky, slow) tunnel connection per experiment."""
import io
import contextlib
import glob
import os
import time
import traceback

import jax

JOBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jobs")
os.makedirs(JOBS, exist_ok=True)

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("worker: connecting...", flush=True)
t0 = time.time()
print("worker: devices", jax.devices(), time.time() - t0, flush=True)

while True:
    for path in sorted(glob.glob(os.path.join(JOBS, "*.py"))):
        out_path = path + ".out"
        # run any job whose .out is missing or older than the .py —
        # deleting a job's .out (or editing the job) queues a rerun
        if os.path.exists(out_path) and \
                os.path.getmtime(out_path) >= os.path.getmtime(path):
            continue
        print("worker: running", path, flush=True)
        buf = io.StringIO()
        t0 = time.time()
        try:
            # drop cached library modules so jobs always see current code
            # (edits between jobs were silently invisible before; r4 gotcha
            # #8). jax compile cache (.jax_cache) absorbs the re-traces.
            import sys as _sys
            for name in [m for m in _sys.modules
                         if m.startswith(("jdeflate_tpu", "bench",
                                          "devtime", "truetime"))]:
                del _sys.modules[name]
            src = open(path).read()
            with contextlib.redirect_stdout(buf):
                exec(compile(src, path, "exec"), {"__name__": "__job__"})
        except Exception:
            buf.write(traceback.format_exc())
        buf.write(f"\n[job wall {time.time()-t0:.1f}s]\n")
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
        print("worker: done", path, flush=True)
    time.sleep(2)
