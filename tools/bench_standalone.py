"""Standalone-cluster N -> 4N scaling proxy (VERDICT r3 next #4).

The north rule's scaling criterion is ">=0.8 throughput efficiency from
N to 4N EXECUTORS". The previous sandbox proxy — local[8] vs local[32]
threads inside ONE JVM — conflates executor scaling with a shared heap,
one GC, one shuffle-memory arena, and this VM's thread-level CPU quota
(anti-scaling past ~16 threads, see bench.py's bandwidth probe). This
tool builds the structurally honest proxy: a real Spark standalone
cluster on this host — separate master, worker, and executor JVMs with
separate memory arenas — and runs the SAME fixed-superstep PageRank job
via ``spark-submit --py-files`` (the north-rule launch shape) at
1 executor and 4 executors.

    python tools/bench_standalone.py            # 1 -> 4 executors x 4 cores
    SPARK_GRAFT_EXEC_CORES=8 python tools/bench_standalone.py   # x 8 cores

Output: one JSON line per pair with throughput at both sizes plus
efficiency = thr_4N / (4 * thr_N); the driver-facing BENCH record and
BASELINE.md cite it alongside the thread-based pair.

Topology per measured size: one worker JVM per executor, each worker
offering exactly ``exec_cores`` cores and ``exec_mem`` memory, so the
scheduler places exactly one executor per worker — executor count is
the ONLY thing that changes between N and 4N. Shuffle partitions and
``num_parts`` are pinned to the same value at both sizes (identical
work decomposition; more executors just drain the same partitions in
fewer waves — exactly what adding machines does on a real cluster).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER_HOST = "127.0.0.1"
MASTER_PORT = int(os.environ.get("SPARK_GRAFT_MASTER_PORT", "7177"))
MASTER_UI = MASTER_PORT + 1000
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"
LOG_DIR = tempfile.mkdtemp(prefix="spark_standalone_logs_")


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _spawn(args: list[str], log: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["SPARK_HOME"] = _spark_home()
    env.setdefault("SPARK_LOG_DIR", LOG_DIR)
    fh = open(log, "w")
    return subprocess.Popen(
        args, stdout=fh, stderr=subprocess.STDOUT, env=env, cwd=REPO
    )


def _master_state() -> dict:
    with urllib.request.urlopen(
        f"http://{MASTER_HOST}:{MASTER_UI}/json/", timeout=5
    ) as r:
        return json.load(r)


def _wait_workers(n: int, timeout_s: float = 120.0) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        try:
            st = _master_state()
            alive = [w for w in st.get("workers", []) if w["state"] == "ALIVE"]
            if len(alive) == n:
                return
        except Exception:
            pass
        time.sleep(0.5)
    raise TimeoutError(f"standalone cluster: {n} workers not ALIVE in {timeout_s}s")


def _zip_package(dest: str) -> str:
    path = os.path.join(dest, "drone_spark.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "drone_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


class Cluster:
    """A master + ``n_workers`` worker JVMs, torn down on exit."""

    def __init__(self, n_workers: int, cores: int, mem: str):
        self.procs: list[subprocess.Popen] = []
        sc = os.path.join(_spark_home(), "bin", "spark-class")
        self.procs.append(
            _spawn(
                [sc, "org.apache.spark.deploy.master.Master",
                 "-h", MASTER_HOST, "-p", str(MASTER_PORT),
                 "--webui-port", str(MASTER_UI)],
                os.path.join(LOG_DIR, "master.log"),
            )
        )
        # wait for the master RPC before workers try to register
        t0 = time.monotonic()
        while time.monotonic() - t0 < 90:
            try:
                _master_state()
                break
            except Exception:
                time.sleep(0.5)
        try:
            for i in range(n_workers):
                self.procs.append(
                    _spawn(
                        [sc, "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                         "-h", MASTER_HOST, "-c", str(cores), "-m", mem,
                         "--webui-port", str(MASTER_UI + 1 + i)],
                        os.path.join(LOG_DIR, f"worker{i}.log"),
                    )
                )
            _wait_workers(n_workers)
        except Exception:
            self.shutdown()  # no orphan JVMs on a failed spin-up
            raise

    def shutdown(self) -> None:
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()


def _submit(
    edges_path: str, steps: int, num_parts: int, exec_cores: int,
    exec_mem: str, py_zip: str, backend: str, timeout_s: int = 3600,
    max_cores: int | None = None,
) -> dict:
    out_json = tempfile.mktemp(suffix=".json")
    cmd = [
        os.path.join(_spark_home(), "bin", "spark-submit"),
        "--master", MASTER_URL,
        "--py-files", py_zip,
        "--conf", f"spark.driver.host={MASTER_HOST}",
        "--conf", "spark.driver.memory=12g",
        "--conf", f"spark.executor.cores={exec_cores}",
        "--conf", f"spark.executor.memory={exec_mem}",
        "--conf", "spark.ui.enabled=false",
    ]
    if max_cores is not None:
        # executor count for THIS application: standalone executors are
        # per-application JVMs capped by spark.cores.max / executor.cores
        cmd += ["--conf", f"spark.cores.max={max_cores}"]
    # tmpfs shuffle dir: measured ~1.5x on the 4-executor pair (disk
    # shuffle files vs /dev/shm); local disk does not scale with
    # executors and would fold storage speed into the scaling number
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-standalone-tmp"
        os.makedirs(shm, exist_ok=True)
        cmd += ["--conf", f"spark.local.dir={shm}"]
    cmd += [
        os.path.join(REPO, "tools", "cluster_pr_job.py"),
        edges_path, str(steps), str(num_parts), out_json, backend,
    ]
    env = dict(os.environ)
    env["SPARK_HOME"] = _spark_home()
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    r = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout_s, env=env, cwd=REPO
    )
    if r.returncode != 0 or not os.path.exists(out_json):
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError(f"spark-submit failed (rc={r.returncode})")
    with open(out_json) as fh:
        return json.load(fh)


def measure_pair(
    edges_path: str,
    exec_cores: int,
    exec_mem: str,
    steps: int,
    num_parts: int,
    backend: str = "relational",
    sizes: tuple[int, int] = (1, 4),
    repeats: int = 2,
) -> dict:
    py_zip = _zip_package(tempfile.mkdtemp(prefix="pyfiles_"))
    worker_mem = f"{int(exec_mem.rstrip('g')) + 1}g"
    results: dict[int, dict] = {}
    # ONE cluster sized for the high side, reused by every run (round 6):
    # executor JVMs are per-APPLICATION in standalone mode — spawned at
    # submit, torn down at app exit — so per-size executor-JVM isolation
    # is unchanged; ``spark.cores.max = n_executors × exec_cores`` picks
    # how many of the (1-core) workers host an executor for each run.
    # Spinning a fresh master+workers per run measured ~12-15 s × 2 ×
    # repeats of pure harness overhead inside the frozen bench's wall.
    #
    # Deadline (SPARK_GRAFT_STANDALONE_DEADLINE_S): the frozen driver
    # bench runs under a hard measurement window that r5 blew entirely
    # (BENCH_r05.json rc=124 — no data at all); later repeats are
    # skipped once the phase exceeds the deadline, as long as every
    # size has at least one result — min-of-whatever-completed, the
    # same graceful-degradation contract as bench.py's own
    # SPARK_GRAFT_SCALING_BUDGET_S for the in-VM pairs.
    deadline_s = float(
        os.environ.get("SPARK_GRAFT_STANDALONE_DEADLINE_S", "600")
    )
    t0 = time.monotonic()
    cluster = Cluster(max(sizes), exec_cores, worker_mem)
    try:
        # interleave sizes across repeats (min-of-N per size): the host
        # is a shared VM, so back-to-back same-size repeats would fold a
        # co-tenant load swing into the ratio
        for rep in range(repeats):
            if (
                rep > 0
                and time.monotonic() - t0 > deadline_s
                and all(n in results for n in sizes)
            ):
                break
            for n in sizes:
                run = _submit(
                    edges_path, steps, num_parts, exec_cores, exec_mem,
                    py_zip, backend, max_cores=n * exec_cores,
                )
                if n not in results or run["iter_seconds"] < results[n]["iter_seconds"]:
                    results[n] = run
    finally:
        cluster.shutdown()
    lo, hi = sizes
    thr_lo = results[lo]["edges_per_sec"]
    thr_hi = results[hi]["edges_per_sec"]
    return {
        "proxy": "standalone-cluster",
        "backend": backend,
        "executors_low": lo,
        "executors_high": hi,
        "exec_cores": exec_cores,
        "cores_low": lo * exec_cores,
        "cores_high": hi * exec_cores,
        "supersteps": steps,
        "num_parts": num_parts,
        "n_edges": results[hi]["n_edges"],
        "iter_seconds_low": results[lo]["iter_seconds"],
        "iter_seconds_high": results[hi]["iter_seconds"],
        "edges_per_sec_low": thr_lo,
        "edges_per_sec_high": thr_hi,
        "efficiency": round(thr_hi / (thr_lo * (hi / lo)), 3),
    }


def main() -> None:
    from drone_spark.session import get_spark
    from drone_spark.corpus import generate_edges_direct

    n_vertices = int(os.environ.get("SPARK_GRAFT_SCALING_VERTICES", "2000000"))
    steps = int(os.environ.get("SPARK_GRAFT_SCALING_STEPS", "3"))
    # 1 core/executor: the high side is then 4 busy threads, inside this
    # VM's real-CPU envelope, so the pair isolates EXECUTOR-count scaling
    # from the co-tenant thread quota (measured: 4EXx4c anti-scales purely
    # because 16 sustained threads get throttled; 4EXx1c == 1EXx4c shows
    # per-executor overhead is ~0). See BASELINE.md round 4.
    exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "1"))
    exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM", "14g")
    num_parts = int(os.environ.get("SPARK_GRAFT_SCALING_PARTS", "32"))
    backend = os.environ.get("SPARK_GRAFT_SCALING_BACKEND", "relational")
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))

    edges_dir = tempfile.mkdtemp(prefix="standalone_edges_") + "/edges"
    spark = get_spark("standalone-gen", cores=8, shuffle_partitions=32)
    generate_edges_direct(spark, n_vertices, seed=42).write.mode(
        "overwrite"
    ).parquet(edges_dir)
    spark.stop()

    try:
        report = measure_pair(
            edges_dir, exec_cores, exec_mem, steps, num_parts,
            backend=backend, repeats=repeats,
        )
        report["n_vertices"] = n_vertices
        print(json.dumps(report))
    finally:
        shutil.rmtree(os.path.dirname(edges_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
