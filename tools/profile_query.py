"""Per-stage profiling for any queries() entry: run it and print Ray
Data's execution stats (per-operator wall time, blocks, rows, memory) —
the feedback loop for batch-size / concurrency tuning.

Usage: python tools/profile_query.py <query> [sf_dir] [--rows]

The result Dataset is consumed with a count-only fold (no driver
materialization), then ``ds.stats()`` is printed.  Non-Dataset results
(driver-side tables) print their shape and the wall time only.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith(
        "--") else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if name not in qs:
        print(f"unknown query {name!r}; known: {sorted(qs)}")
        return 2
    t0 = time.perf_counter()
    res = qs[name](sf_dir)
    if hasattr(res, "stats"):  # ray.data.Dataset
        # consume THIS dataset (stats attach to the executed lineage);
        # iter_batches streams — no driver materialization
        n = sum(
            b.num_rows for b in res.iter_batches(batch_format="pyarrow")
        )
        dt = time.perf_counter() - t0
        print(res.stats())
        print(f"\n=== {name}: {n} rows in {dt:.2f}s over {sf_dir} ===")
    else:
        dt = time.perf_counter() - t0
        shape = getattr(res, "shape", None) or (
            res.num_rows if hasattr(res, "num_rows") else len(res)
        )
        print(f"=== {name}: driver-side result {shape} in {dt:.2f}s "
              f"(no Dataset stats) ===")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
