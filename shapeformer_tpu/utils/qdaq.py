"""qdaq: queued device-pool job runner for independent experiments.

Semantics parity with xgutils/qdaq.py:17-128: run N jobs over M devices with
a multiprocessing pool fed from a device-id queue; a failing job logs its
exception to multip.out and returns its device to the pool.

On TPU each worker process pins its device set via JAX platform env vars
before importing jax (the reference pins CUDA_VISIBLE_DEVICES per worker,
trainer.py:344).  With a single local chip jobs serialize, which is the
correct degenerate behavior.
"""
from __future__ import annotations

import multiprocessing as mp
import os
import traceback


class Job:
    """Subclass and implement run(device_id)."""

    def run(self, device_id):
        raise NotImplementedError


def _worker(job, device_id, device_queue, log_path):
    try:
        os.environ.setdefault("TPU_VISIBLE_DEVICES", str(device_id))
        job.run(device_id)
    except Exception:
        with open(log_path, "a") as f:
            f.write(f"Job {job!r} on device {device_id} failed:\n")
            f.write(traceback.format_exc() + "\n")
        traceback.print_exc()
    finally:
        device_queue.put(device_id)


def start(jobs, device_ids, log_path="multip.out"):
    """Run every job, at most len(device_ids) concurrently, each bound to a
    device id pulled from the pool (qdaq.start, qdaq.py:75-128)."""
    ctx = mp.get_context("spawn")
    device_queue = ctx.Queue()
    for d in device_ids:
        device_queue.put(d)
    procs = []
    for job in jobs:
        device_id = device_queue.get()            # blocks until one is free
        p = ctx.Process(target=_worker,
                        args=(job, device_id, device_queue, log_path))
        p.start()
        procs.append(p)
    for p in procs:
        p.join()
    return [p.exitcode for p in procs]
