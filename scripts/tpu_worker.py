#!/usr/bin/env python
"""Persistent TPU experiment worker.

Holds the (tunneled) device for the whole session and executes job files
in-process, so each experiment skips device re-acquisition (which can
block for minutes through the tunnel after a process hand-off).

Protocol: watch JOB_DIR for `*.py` files; exec each (newest first is NOT
guaranteed — submit one at a time), writing stdout+stderr+traceback to
`<job>.out` and renaming the job to `<job>.done`.  Stop by dropping a file
named `STOP`.
"""
import io
import os
import sys
import time
import traceback

JOB_DIR = os.environ.get("TPUBWA_JOB_DIR", "/tmp/tpu_jobs")


def main():
    os.makedirs(JOB_DIR, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "1.0")
    import jax

    t0 = time.monotonic()
    print(f"devices: {jax.devices()} in {time.monotonic()-t0:.1f}s",
          flush=True)
    while True:
        if os.path.exists(os.path.join(JOB_DIR, "STOP")):
            print("stopping", flush=True)
            return
        jobs = sorted(f for f in os.listdir(JOB_DIR) if f.endswith(".py"))
        if not jobs:
            time.sleep(0.5)
            continue
        job = os.path.join(JOB_DIR, jobs[0])
        out_path = job[:-3] + ".out"
        print(f"running {job}", flush=True)
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        t0 = time.monotonic()
        try:
            sys.stdout = sys.stderr = buf
            src = open(job).read()
            g = {"__name__": "__tpu_job__"}
            exec(compile(src, job, "exec"), g)
            ok = True
        except BaseException:
            traceback.print_exc()
            ok = False
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        dt = time.monotonic() - t0
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[worker] {'OK' if ok else 'FAIL'} in {dt:.1f}s\n")
        os.replace(job, job[:-3] + ".done")
        print(f"done {job} ({'OK' if ok else 'FAIL'}, {dt:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
