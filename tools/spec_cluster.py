"""Fake two-host standalone Spark cluster on one machine.

Why it exists (VERDICT r10 #5): speculative execution can NEVER launch a
duplicate attempt when every executor shares one host — TaskSetManager's
speculative dequeue skips any task with a running attempt on the same
host (hasAttemptOnHost), a deliberate guard against correlated slowness.
local[N] and local-cluster[n,c,m] therefore cannot exercise the
duplicate-attempt race at all (measured: an 8 s slow task with
spark.speculation.interval=100ms never spawns attempt 1 in either mode),
so speculation-invariance needs executors the scheduler believes live on
DIFFERENT hosts.

The trick: Spark compares host strings, and every 127.0.0.0/8 address is
bindable loopback on Linux. Launch a standalone master on 127.0.0.1 and
two workers pinned (SPARK_LOCAL_HOSTNAME / --host) to 127.0.0.2 and
127.0.0.3 — three processes, one machine, but the TaskSetManager sees
two distinct executor hosts and will happily schedule a speculative copy
of a slow task on "the other host". Verified: with an 8 s sleep on
(partition 0, attempt 0), the speculative attempt 1 launches on the
second host and WINS the race (the result stage commits attempt 1's
output) — exactly the concurrent-duplicate semantics a 1000-executor
cluster produces routinely.

Master/worker JVMs come from the pyspark distribution's own spark-class;
nothing outside the repo's baked-in environment is used.
"""

from __future__ import annotations

import contextlib
import os
import socket
import subprocess
import time

import pyspark

SPARK_HOME = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")

MASTER_HOST = "127.0.0.1"
WORKER_HOSTS = ("127.0.0.2", "127.0.0.3")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind((MASTER_HOST, 0))
        return s.getsockname()[1]


def _launch(cls: str, args: list[str], host: str, log_path: str):
    env = dict(os.environ)
    env["SPARK_HOME"] = SPARK_HOME
    # Both knobs matter: LOCAL_HOSTNAME is what the process REPORTS as its
    # host (the string the scheduler compares), LOCAL_IP is what it binds.
    env["SPARK_LOCAL_HOSTNAME"] = host
    env["SPARK_LOCAL_IP"] = host
    # A worker must not inherit the driver's Py4J gateway coordinates.
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    log = open(log_path, "w")
    return subprocess.Popen(
        [SPARK_CLASS, cls, *args],
        env=env,
        stdout=log,
        stderr=subprocess.STDOUT,
    )


def _wait_for(predicate, timeout_s: float, what: str) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            return
        time.sleep(0.5)
    raise TimeoutError(f"fake cluster: {what} not up after {timeout_s}s")


def _port_open(host: str, port: int) -> bool:
    with contextlib.suppress(OSError):
        with socket.create_connection((host, port), timeout=0.5):
            return True
    return False


@contextlib.contextmanager
def fake_two_host_cluster(
    cores_per_worker: int = 4,
    memory_per_worker: str = "2g",
    log_dir: str = "/tmp",
):
    """Yield a ``spark://...`` master URL backed by two single-machine
    workers the scheduler sees as distinct hosts. Tears the processes
    down on exit. Logs land in ``log_dir`` (spec_master.log etc.)."""
    port = _free_port()
    procs = [
        _launch(
            "org.apache.spark.deploy.master.Master",
            ["--host", MASTER_HOST, "--port", str(port), "--webui-port", "0"],
            MASTER_HOST,
            os.path.join(log_dir, "spec_master.log"),
        )
    ]
    try:
        _wait_for(
            lambda: _port_open(MASTER_HOST, port), 60, "standalone master"
        )
        url = f"spark://{MASTER_HOST}:{port}"
        for i, host in enumerate(WORKER_HOSTS, 1):
            procs.append(
                _launch(
                    "org.apache.spark.deploy.worker.Worker",
                    [url, "--host", host, "--cores", str(cores_per_worker),
                     "--memory", memory_per_worker, "--webui-port", "0"],
                    host,
                    os.path.join(log_dir, f"spec_worker{i}.log"),
                )
            )
        # Workers registering with the master is observable only in logs;
        # the driver's executor wait below (in the caller's session
        # bootstrap) retries anyway, so a short grace period suffices.
        time.sleep(4)
        yield url
    finally:
        for p in reversed(procs):
            p.terminate()
        deadline = time.time() + 10
        for p in procs:
            with contextlib.suppress(Exception):
                p.wait(timeout=max(0.1, deadline - time.time()))
        for p in procs:
            if p.poll() is None:
                p.kill()
