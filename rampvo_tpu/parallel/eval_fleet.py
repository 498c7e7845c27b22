"""Scene-sharded evaluation fleet.

The reference evaluates scenes strictly sequentially on one pinned GPU
(evaluate.py:313-412). Each VO run is inherently sequential, but scenes are
independent — the TPU-native scale-out is a FLEET: one worker process per
shard, each owning its own accelerator (or a CPU slot), scenes round-robined
across shards, per-shard result JSONs merged by the driver.

Workers are separate processes (not threads) because each owns a JAX
backend; on a multi-chip host, pass per-worker env overrides (e.g.
`TPU_VISIBLE_CHIPS`) via `worker_env`.

Driven by `python -m rampvo_tpu.cli.evaluate --fleet N ...`; each worker
re-invokes the same CLI with `--shard i:N`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def shard_scenes(scenes: list, n_workers: int) -> list[list]:
    """Round-robin scene assignment (host-side)."""
    return [scenes[i::n_workers] for i in range(n_workers)]


def parse_shard(spec: str, scenes: list) -> list:
    """`--shard i:n` -> this worker's scene subset."""
    i, n = (int(x) for x in spec.split(":"))
    if not 0 <= i < n:
        raise ValueError(f"bad shard spec {spec!r}")
    return shard_scenes(scenes, n)[i]


def run_fleet(
    n_workers: int,
    argv: list[str],
    results_path: str | None,
    worker_env: list[dict] | None = None,
    python: str = sys.executable,
) -> dict:
    """Spawn `n_workers` CLI workers, each on a scene shard; merge results.

    argv: the evaluate CLI argument list WITHOUT --fleet/--shard/
    --results_path (the driver appends per-worker --shard and a temp
    --results_path). worker_env[i]: extra env vars for worker i (device
    pinning on multi-chip hosts).
    """
    tmp = tempfile.mkdtemp(prefix="rampvo_fleet_")
    procs = []
    shard_paths = []
    for i in range(n_workers):
        shard_res = os.path.join(tmp, f"shard_{i}.json")
        shard_paths.append(shard_res)
        env = dict(os.environ)
        if worker_env and i < len(worker_env):
            env.update(worker_env[i])
        cmd = [
            python, "-m", "rampvo_tpu.cli.evaluate", *argv,
            "--shard", f"{i}:{n_workers}", "--results_path", shard_res,
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env,
                stdout=open(os.path.join(tmp, f"worker_{i}.log"), "w"),
                stderr=subprocess.STDOUT,
            )
        )

    failed = []
    for i, p in enumerate(procs):
        if p.wait() != 0:
            failed.append(i)
    if failed:
        logs = "\n".join(
            f"--- worker {i} ---\n"
            + open(os.path.join(tmp, f"worker_{i}.log")).read()[-2000:]
            for i in failed
        )
        raise RuntimeError(f"fleet workers {failed} failed:\n{logs}")

    merged: dict = {}
    for path in shard_paths:
        if not os.path.exists(path):
            continue  # empty shard (more workers than scenes)
        shard = json.load(open(path))
        info = shard.pop("test_info", None)
        merged.update(shard)
        if info is not None and "test_info" not in merged:
            merged["test_info"] = info
    if results_path is not None:
        with open(results_path, "w") as f:
            json.dump(merged, f, indent=4)
    return merged
