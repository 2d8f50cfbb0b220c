"""Partition manifests: per-partition lineage + metrics, resume support.

The reference has no checkpointing (an app crash loses in-flight OCR work,
SURVEY.md §4); at 10^12-document scale the north rule requires
partition-granular resume.  Layout::

    out_dir/
      _meta.json                    # config hash, num_partitions, input path
      parts/part=K/ *.parquet      # hive-partitioned extraction output
      manifests/part-K.json        # written AFTER the partition's data is final

A partition is *complete* iff its manifest exists, its ``status`` is
``complete`` and its ``config_hash`` matches the current run's.  On resume,
rows belonging to complete partitions are filtered out right after the read
(cheap vectorized mask), so only missing partitions recompute.  Data is
written to a staging directory and moved into place before the manifest is
written — manifest-last gives per-partition atomicity (write-temp-then-rename,
SURVEY.md §4 "checkpoint/resume" row)."""

from __future__ import annotations

import json
import os


def meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_meta.json")


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifests")


def part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "parts", f"part={part}")


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{part}.json")


def write_meta(out_dir: str, meta: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = meta_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.replace(tmp, meta_path(out_dir))


def write_manifest(out_dir: str, part: int, manifest: dict) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = manifest_path(out_dir, part) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, manifest_path(out_dir, part))


def load_complete_parts(
    out_dir: str,
    config_hash: str,
    num_partitions: int | None = None,
    input_path: str | None = None,
) -> set[int]:
    """Partitions safe to skip on resume.  A manifest counts only when its
    status is complete AND its config_hash matches AND (when given) its
    num_partitions and input_path match the current run — a manifest written
    under a different partition modulus or input would otherwise be treated
    as complete while its rows live in the wrong crc32 bucket."""
    done: set[int] = set()
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if m.get("status") != "complete" or m.get("config_hash") != config_hash:
            continue
        if num_partitions is not None and m.get("num_partitions") != num_partitions:
            continue
        if input_path is not None and m.get("input_path") != input_path:
            continue
        done.add(int(m["part"]))
    return done


def load_meta(out_dir: str) -> dict:
    try:
        with open(meta_path(out_dir)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def load_manifests(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out
