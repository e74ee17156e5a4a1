"""Shuffle-path falsification matrix for the 8 -> 32 core scaling wall.

Round 3 reported the 8 -> 32 leg at 0.591 efficiency and attributed it to
single-socket memory bandwidth (the pure-CPU control scales 3.7x while
shuffle-heavy stages scale ~1.8x).  This probe tries to FALSIFY that
explanation with targeted shuffle-path experiments — if any configuration
materially lifts the 32-core leg, the wall was configuration, not
bandwidth:

  base         the engine defaults (shuffle=64, one /dev/shm local dir)
  shuf_scaled  shuffle partitions scaled with cores (8*cpus)
  dir_shards   spark.local.dir sharded across 8 /dev/shm subdirs
  bigbuf       1 MiB shuffle write buffers + 512 KiB lz4 blocks
  nocompress   shuffle/spill compression off (pure RAM-FS transfers)

Each (variant, cpus) leg runs in its own subprocess JVM (scaling.py
--one, ActiveProcessorCount pinned), best-of-N; identical-env legs are
measured once and reused.  Writes BENCH/probe_8_32.json.

Run:  python BENCH/probe_8_32.py
Env:  SPARK_GRAFT_PROBE_RUNS (default 2) = runs per leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SCALING = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling.py")
CPUS = (8, 32)

SHARD_DIRS = ",".join(f"/dev/shm/spark-probe-{i}" for i in range(8))


def variant_env(name: str, cpus: int) -> dict[str, str]:
    # always pin SHUFFLE explicitly so the leg cache keys on the RESOLVED
    # config: shuf_scaled@8 (64) must hit the same cache entry as base@8
    # (scaling.py's default is also 64) instead of re-measuring it
    env = {"SPARK_GRAFT_DRIVER_MEM": "48g", "SPARK_GRAFT_SHUFFLE": "64"}
    if name == "shuf_scaled":
        env["SPARK_GRAFT_SHUFFLE"] = str(8 * cpus)
    elif name == "dir_shards":
        env["SPARK_GRAFT_LOCAL_DIR"] = SHARD_DIRS
    elif name == "bigbuf":
        env["SPARK_GRAFT_SCALE_EXTRA"] = json.dumps(
            {
                "spark.shuffle.file.buffer": "1m",
                "spark.io.compression.lz4.blockSize": "512k",
            }
        )
    elif name == "nocompress":
        env["SPARK_GRAFT_SCALE_EXTRA"] = json.dumps(
            {
                "spark.shuffle.compress": "false",
                "spark.shuffle.spill.compress": "false",
            }
        )
    return env


def main() -> None:
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    for d in SHARD_DIRS.split(","):
        os.makedirs(d, exist_ok=True)
    leg_cache: dict[str, dict] = {}  # identical env+cpus measured once
    results: dict[str, dict] = {}
    for name in ("base", "shuf_scaled", "dir_shards", "bigbuf", "nocompress"):
        legs = {}
        for cpus in CPUS:
            env_delta = variant_env(name, cpus)
            key = json.dumps({"cpus": cpus, **env_delta}, sort_keys=True)
            if key not in leg_cache:
                best = None
                for _ in range(reps):
                    out = subprocess.run(
                        [sys.executable, SCALING, "--one", str(cpus)],
                        capture_output=True,
                        text=True,
                        env=dict(os.environ, **env_delta),
                        timeout=3600,
                    )
                    if out.returncode != 0 or not out.stdout.strip():
                        sys.stderr.write(out.stderr[-4000:])
                        raise RuntimeError(
                            f"{name}/local[{cpus}] failed (rc={out.returncode})"
                        )
                    run = json.loads(out.stdout.strip().splitlines()[-1])
                    print(
                        json.dumps({"variant": name, **{k: run[k] for k in ("cpus", "wall_sec", "rows_per_sec")}}),
                        flush=True,
                    )
                    if best is None or run["wall_sec"] < best["wall_sec"]:
                        best = run
                leg_cache[key] = best
            legs[cpus] = leg_cache[key]
        t8, t32 = legs[8]["wall_sec"], legs[32]["wall_sec"]
        results[name] = {
            "t8_sec": t8,
            "t32_sec": t32,
            "speedup": round(t8 / t32, 3),
            "efficiency_8_32": round((t8 / t32) / 4, 3),
        }
        print(json.dumps({name: results[name]}), flush=True)
    summary = {
        "metric": "8->32 core shuffle-path falsification matrix (2M-inst mine)",
        "runs_per_leg": reps,
        "variants": results,
        "best_variant": max(results, key=lambda n: results[n]["efficiency_8_32"]),
    }
    print(json.dumps(summary))
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_8_32.json")
    with open(art, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
